from .stse_fused import fold_stse_params, fused_stse_forward

__all__ = ["fold_stse_params", "fused_stse_forward"]
