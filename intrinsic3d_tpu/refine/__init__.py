from intrinsic3d_tpu.refine.residuals import Params, Assembly  # noqa: F401
from intrinsic3d_tpu.refine.solver import gn_iteration  # noqa: F401
