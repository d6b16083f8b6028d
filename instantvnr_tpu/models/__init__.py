from instantvnr_tpu.models.network import (  # noqa: F401
    NeuralField,
    network_apply,
    init_params,
)
from instantvnr_tpu.models.fvsrn import (  # noqa: F401
    FvsrnConfig,
    FvsrnField,
)
from instantvnr_tpu.models.optimizer import (  # noqa: F401
    AdamState,
    adam_init,
    adam_update,
    lr_at_step,
)
from instantvnr_tpu.models.trainer import (  # noqa: F401
    TrainState,
    create_train_state,
    train_step,
    train_steps,
)
from instantvnr_tpu.models.metrics import psnr, mssim, decode_volume  # noqa: F401
