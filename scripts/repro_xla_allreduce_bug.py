"""Upstream XLA:CPU repro: bf16 all-reduce inside a partial-auto shard_map scan.

jax 0.9.0 / XLA:CPU: the AllReducePromotion pass (bf16 all-reduces are
unsupported on the CPU backend, so they are promoted to f32) calls
CloneAllReduce -> HloInstruction::CreateBinary with opcode ``copy`` and hits a
CHECK failure — the PROCESS aborts:

    F hlo_instruction.cc:1585 Invalid binary instruction opcode copy

Trigger: a bfloat16 row-sharded contraction (GSPMD inserts the partial-sum
all-reduce over the auto 'model' axis) inside a lax.scan under a shard_map
that is manual over 'pipe' only — i.e. exactly the PP+TP composition of
parallel/pipeline.py (pipeline_blocks tp_axis=...).  TPUs reduce bf16
natively, so the promotion pass never runs there and the composition works.

Because the failure is a hard abort, the probe runs in a SUBPROCESS.  Exit
code 0 = bug fixed upstream (remove the cpu-backend bf16 guard in
parallel/pipeline.py); 1 = still present.
"""

import os
import subprocess
import sys

_PROBE = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from functools import partial
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), axis_names=("pipe", "model"))
DIM = 16
W = (0.1 * jax.random.normal(jax.random.PRNGKey(0), (2, DIM, DIM))).astype(jnp.bfloat16)
x = jax.random.normal(jax.random.PRNGKey(1), (4, DIM), jnp.bfloat16)

@partial(shard_map, mesh=mesh, in_specs=(P("pipe"), P()), out_specs=P(),
         axis_names={"pipe"}, check_vma=False)
def f(W_l, x_l):
    # rows of W sharded over the auto 'model' axis -> bf16 partial-sum
    # all-reduce inside the scan body
    def body(h, w):
        return jnp.tanh(h @ w), None
    h, _ = jax.lax.scan(body, x_l, W_l)
    return jax.lax.psum(h, "pipe")

Ws = jax.device_put(W, NamedSharding(mesh, P("pipe", "model", None)))
out = jax.jit(f)(Ws, x)
jax.block_until_ready(out)
print("OK")
"""


def main() -> int:
    r = subprocess.run([sys.executable, "-c", _PROBE], capture_output=True,
                       text=True, timeout=600,
                       env={**os.environ, "JAX_TRACEBACK_FILTERING": "off"})
    if r.returncode == 0 and "OK" in r.stdout:
        print("fixed: bf16 all-reduce promotion compiles — remove the "
              "cpu-backend bf16 guard in parallel/pipeline.py")
        return 0
    sig = "Invalid binary instruction opcode copy"
    present = sig in (r.stderr or "")
    print(f"still broken (exit {r.returncode}; "
          f"{'CloneAllReduce CHECK' if present else 'unexpected failure'})")
    if not present:
        print((r.stderr or "")[-2000:])
    return 1


if __name__ == "__main__":
    sys.exit(main())
