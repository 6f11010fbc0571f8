from ttc.ops.regrid import apply_regrid, regrid_weights
from ttc.ops.whittaker import WhittakerSmoother

__all__ = ["apply_regrid", "regrid_weights", "WhittakerSmoother"]
