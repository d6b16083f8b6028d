from instantvnr_tpu.data.volume import Volume, load_volume, synthetic_volume  # noqa: F401
from instantvnr_tpu.data.sampler import StaticSampler  # noqa: F401
