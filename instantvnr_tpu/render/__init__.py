from instantvnr_tpu.render.camera import Camera, camera_rays  # noqa: F401
from instantvnr_tpu.render.raymarch import (  # noqa: F401
    RaymarchSettings,
    raymarch,
)
from instantvnr_tpu.render.renderer import (  # noqa: F401
    Renderer,
    reference_sample_fn,
    make_neural_sample_fn,
)
