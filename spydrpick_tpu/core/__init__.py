from spydrpick_tpu.core.alphabet import N_STATES, GAP_STATE
from spydrpick_tpu.core.alignment import Alignment

__all__ = ["N_STATES", "GAP_STATE", "Alignment"]
