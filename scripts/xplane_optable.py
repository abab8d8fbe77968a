"""Dominant-op table from a raw JAX profiler trace (xplane.pb).

Parses the device plane's "XLA Ops" line and aggregates wall time two ways:
by HLO opcode (fusion / custom-call / pad / copy / ...) and by op signature
(opcode + result shape), so kernel time, XLA fusion time, and pure data
movement can be told apart per step.  Pairs with scripts/profile_step.py,
which writes the traces this reads (BENCHMARKS.md "MFU at 257-1024 tokens"
section; VERDICT r2 next-step #4).

The reference has no profiling surface at all (SURVEY §5.1 — wall-clock
prints only, ref:src/v1/gan.py:175-177); this is part of the tracing
subsystem the TPU rebuild adds.

Usage: python scripts/xplane_optable.py <trace.xplane.pb|profile_dir> [steps_in_window]
Prints one JSON document.
"""

import collections
import glob
import json
import os
import re
import sys

# HLO opcodes we classify on; first match inside the instruction text wins.
_OPCODES = (
    "fusion", "custom-call", "copy-start", "copy-done", "copy", "pad",
    "slice", "dynamic-update-slice", "dynamic-slice", "transpose",
    "concatenate", "reshape", "bitcast", "convolution", "dot", "all-reduce",
    "reduce", "rng-bit-generator", "broadcast", "convert", "iota",
    "async-start", "async-done", "select", "compare", "add", "multiply",
    "tuple", "get-tuple-element", "reduce-precision", "scatter", "gather",
)
_TOK = re.compile(r"([a-z][a-z0-9-]*)\(")

_DATA_MOVEMENT = {"copy", "pad", "slice", "transpose", "concatenate",
                  "reshape", "bitcast", "copy-start", "copy-done",
                  "dynamic-update-slice", "dynamic-slice"}


def opcode_of(instr: str) -> str:
    for tok in _TOK.findall(instr):
        if tok in _OPCODES:
            return tok
    return "other"


def load_ops(path: str):
    """-> (total_ms, {instr_text: ms}, {instr_text: count}) from the TPU plane."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # vendored in the image

    if os.path.isdir(path):
        cands = glob.glob(os.path.join(path, "**", "*.xplane.pb"), recursive=True)
        if not cands:
            raise FileNotFoundError(f"no *.xplane.pb under {path}")
        path = cands[0]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        meta = plane.event_metadata
        ms, count = collections.Counter(), collections.Counter()
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name
                ms[name] += ev.duration_ps / 1e9
                count[name] += 1
        if ms:
            return sum(ms.values()), ms, count
    raise ValueError(f"no TPU 'XLA Ops' line in {path}")


def signature(instr: str) -> str:
    """opcode + result shape(s), e.g. 'custom-call (bf16[384,1536,128], ...)'."""
    head = instr.split(" = ", 1)[1] if " = " in instr else instr
    m = re.match(r"(\([^=]*?\)|\S+)\s", head)
    shape = (m.group(1) if m else head)[:72]
    return f"{opcode_of(instr)} {shape}"


def main():
    path = sys.argv[1]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else None
    total, ms, count = load_ops(path)

    by_opcode = collections.Counter()
    for instr, t in ms.items():
        by_opcode[opcode_of(instr)] += t
    data_movement = sum(v for k, v in by_opcode.items() if k in _DATA_MOVEMENT)

    by_sig = collections.Counter()
    sig_count = collections.Counter()
    for instr, t in ms.items():
        s = signature(instr)
        by_sig[s] += t
        sig_count[s] += count[instr]

    out = {
        "trace": path,
        "window_ms": round(total, 1),
        "steps_in_window": steps,
        "per_step_ms": round(total / steps, 2) if steps else None,
        "data_movement_pct": round(100 * data_movement / total, 1),
        "by_opcode": [
            {"op": k, "ms": round(v, 1), "pct": round(100 * v / total, 1)}
            for k, v in by_opcode.most_common() if v >= total * 0.001
        ],
        "top_signatures": [
            {"sig": k, "ms": round(v, 1), "count": sig_count[k],
             "pct": round(100 * v / total, 1)}
            for k, v in by_sig.most_common(20)
        ],
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
