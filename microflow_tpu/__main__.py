"""Command-line front door: ``python -m microflow_tpu <cmd>``.

The reference's "CLI" is cargo (build/run/test, SURVEY.md §1); this is the
engine-native equivalent for operating on ``.tflite`` files directly:

    python -m microflow_tpu inspect models/person_detect.tflite
    python -m microflow_tpu predict models/sine.tflite --fill 0.5
    python -m microflow_tpu bench models/person_detect.tflite --batch 8192
    python -m microflow_tpu synth lenet /tmp/lenet.tflite
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def cmd_inspect(args):
    from .frontend.parser import parse
    from .utils.flops import macs_per_inference

    g = parse(args.model)
    print(f"model: {g.name}")
    print(f"input: {g.input_shape} {g.input_dtype} scale={g.input_q.scale0} zp={g.input_q.zp0}")
    print(f"output: {g.output_shape} {g.output_dtype} scale={g.output_q.scale0} zp={g.output_q.zp0}")
    print(f"layers: {len(g.layers)}   MACs/inference: {macs_per_inference(g):,}")
    for l in g.layers:
        name = type(l).__name__.replace("Layer", "")
        extra = ""
        g2 = getattr(l, "geom", None)
        if g2 is not None:
            extra = (f" k={g2.k_rows}x{g2.k_cols} s={g2.stride_rows}x{g2.stride_cols}"
                     f" {g2.padding.value}")
        act = getattr(l, "activation", None)
        if act is not None:
            extra += f" act={act.value}"
        print(f"  [{l.index:>2}] {name:<16} out={tuple(l.out_shape)}{extra}")


def cmd_predict(args):
    import numpy as np

    from . import compile_tflite

    m = compile_tflite(args.model, backend=args.backend)
    shape = (args.batch, *m.graph.input_shape)
    if args.input:
        x = np.load(args.input).astype(np.float32).reshape(shape)
    else:
        x = np.full(shape, args.fill, np.float32)
    out = np.asarray(m.predict(x))
    np.set_printoptions(precision=8, suppress=True)
    print(out)


def cmd_bench(args):
    import os
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bench = os.path.join(root, "bench.py")
    model = args.model
    if not os.path.exists(model) and os.path.exists(os.path.join(root, model)):
        model = os.path.join(root, model)
    cmd = [sys.executable, bench, "--model", model,
           "--batch", str(args.batch), "--iters", str(args.iters)]
    if args.backend:
        cmd += ["--backend", args.backend]
    sys.exit(subprocess.call(cmd))


def cmd_synth(args):
    from .models import synth

    data = {"lenet": synth.lenet, "full_ops": synth.full_ops}[args.kind]()
    synth.write(args.out, data)
    print(f"wrote {args.out} ({len(data)} bytes)")


def cmd_expansion(args):
    from . import compile_tflite

    m = compile_tflite(args.model, backend=args.backend)
    print(m.expansion(batch_size=args.batch))


def main(argv=None):
    ap = argparse.ArgumentParser(prog="microflow_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("inspect", help="print the parsed/folded graph IR")
    p.add_argument("model")
    p.set_defaults(fn=cmd_inspect)

    p = sub.add_parser("predict", help="run a forward pass")
    p.add_argument("model")
    p.add_argument("--input", help=".npy file (reshaped to [batch, *input_shape])")
    p.add_argument("--fill", type=float, default=0.5, help="constant input value")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--backend", default=None, choices=[None, "xla", "pallas", "fused", "hybrid", "packed", "flat"])
    p.set_defaults(fn=cmd_predict)

    p = sub.add_parser("bench", help="run the throughput benchmark")
    p.add_argument("model", nargs="?", default="models/person_detect.tflite")
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--backend", default=None, choices=[None, "xla", "pallas", "fused", "hybrid", "packed", "flat"])
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("synth", help="write a synthetic test model")
    p.add_argument("kind", choices=["lenet", "full_ops"])
    p.add_argument("out")
    p.set_defaults(fn=cmd_synth)

    p = sub.add_parser("expansion", help="dump the traced program (the "
                       "reference dumps target/microflow-expansion.rs)")
    p.add_argument("model")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--backend", default=None)
    p.set_defaults(fn=cmd_expansion)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    main()
