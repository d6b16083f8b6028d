from instantvnr_tpu.parallel.mesh import make_mesh, data_axis_size  # noqa: F401
from instantvnr_tpu.parallel.train import (  # noqa: F401
    make_dp_hostbatch_step,
    make_dp_train_step,
    replicate_state,
    shard_host_batch,
)
from instantvnr_tpu.parallel.render import make_sharded_render_fn  # noqa: F401
