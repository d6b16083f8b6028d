from instantvnr_tpu.ops.trilinear import (  # noqa: F401
    sample_volume,
    sample_volume_tex,
    sample_gradient,
)
from instantvnr_tpu.ops.hash_encoding import (  # noqa: F401
    HashGridSpec,
    hash_encode,
    init_hash_table,
)
from instantvnr_tpu.ops.mlp import mlp_apply, init_mlp_params  # noqa: F401
