from .stse import STSE, STSAE, STSVAE, build_model

__all__ = ["STSE", "STSAE", "STSVAE", "build_model"]
