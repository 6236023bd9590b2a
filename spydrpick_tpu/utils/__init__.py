from spydrpick_tpu.utils.stopwatch import Stopwatch
from spydrpick_tpu.utils.uniquefile import unique_path

__all__ = ["Stopwatch", "unique_path"]
