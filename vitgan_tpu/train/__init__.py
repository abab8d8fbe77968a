from vitgan_tpu.train.state import TrainState, create_train_state, make_optimizer  # noqa: F401
from vitgan_tpu.train.step import make_train_step, make_sample_fn, make_serve_sample_fn  # noqa: F401
