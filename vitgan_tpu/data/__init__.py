from vitgan_tpu.data.datasets import load_dataset, synthetic_dataset  # noqa: F401
from vitgan_tpu.data.pipeline import HostDataPipeline, make_pipeline  # noqa: F401
