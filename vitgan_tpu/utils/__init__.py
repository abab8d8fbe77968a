from vitgan_tpu.utils.run_dirs import RunDirs, construct_directories  # noqa: F401
from vitgan_tpu.utils.logging import get_logger, MetricLogger  # noqa: F401
