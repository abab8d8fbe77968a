from vitgan_tpu.hpo.sweep import run_sweep, sample_search_space  # noqa: F401
