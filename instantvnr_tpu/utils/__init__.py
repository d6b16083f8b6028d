from instantvnr_tpu.utils.math import (  # noqa: F401
    ray_box_intersect,
    look_at_rays,
    normalize,
)
from instantvnr_tpu.utils.tfn import TransferFunction, bake_transfer_function  # noqa: F401
