"""Multi-device sharding of the MI tile sweep (see mesh.py)."""
