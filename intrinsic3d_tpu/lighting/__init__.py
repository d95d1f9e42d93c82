from intrinsic3d_tpu.lighting.sh import (  # noqa: F401
    NUM_SH,
    sh_basis,
    compute_shading,
    shading_gradient_difference,
)
