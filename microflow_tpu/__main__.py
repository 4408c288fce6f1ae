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


def cmd_train(args):
    """On-device training loop over .npy data (or a built-in retarget
    demo), mirroring the reference's train examples
    (``examples/sine_train.rs:30-58``: epochs of predict_train +
    update_layers, then an eval pass)."""
    import numpy as np

    from . import compile_tflite_train
    from .utils import checkpoint

    m = compile_tflite_train(
        args.model, num_train_layers=args.layers, loss=args.loss,
        skip_last_layer_train=args.skip_last, backend=args.backend,
        gradient_mode=args.gradient_mode,
    )
    if args.load:
        m.params = checkpoint.load_params(args.load)

    if bool(args.x) != bool(args.y):
        raise SystemExit("--x and --y must be given together")

    rng = np.random.default_rng(args.seed)
    if args.x:
        x = np.load(args.x).astype(np.float32)
        x = x.reshape(-1, *m.graph.input_shape)
        y = np.load(args.y).astype(np.float32)
        y = y.reshape(len(x), *np.asarray(m.graph.output_shape).tolist())
    else:
        # Retarget demo: fit 0.5x the model's own initial predictions on
        # a fixed random dataset (works for any graph; loss must drop).
        x = rng.uniform(0.0, 1.0, (256, *m.graph.input_shape)).astype(np.float32)
        y = 0.5 * np.asarray(m.predict(x))
        print("no --x/--y given: retarget demo (fit 0.5 * initial predictions)")

    gt = np.asarray(m.quantize_target(y))
    n = len(x)
    for epoch in range(args.epochs):
        order = rng.permutation(n)
        losses = []
        for s in range(0, n - args.batch + 1, args.batch):
            idx = order[s:s + args.batch]
            out = np.asarray(m.predict_train(x[idx], gt[idx], args.lr))
            losses.append(float(np.mean((out - y[idx].reshape(out.shape)) ** 2)))
            m.update_layers(len(idx), args.lr)
        print(f"epoch {epoch:>3}  mse {np.mean(losses):.6f}")

    if args.save:
        checkpoint.save_params(args.save, m.params)
        print(f"saved params -> {args.save}")
    if args.export:
        m.export(args.export)
        print(f"exported trained model -> {args.export}")


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
    p.add_argument("--backend", default=None, choices=[None, "xla", "pallas", "flat", "fused", "hybrid", "packed"])
    p.set_defaults(fn=cmd_predict)

    p = sub.add_parser("bench", help="run the throughput benchmark")
    p.add_argument("model", nargs="?", default="models/person_detect.tflite")
    # bench.py's measured defaults (docs/PERFORMANCE.md batch sweep)
    p.add_argument("--batch", type=int, default=49152)
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--backend", default=None, choices=[None, "xla", "pallas", "flat", "fused", "hybrid", "packed"])
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("train", help="run an on-device training loop")
    p.add_argument("model")
    p.add_argument("--layers", type=int, default=1,
                   help="number of trailing trainable layers (macro arg n)")
    p.add_argument("--loss", default="mse", choices=["mse", "crossentropy"])
    p.add_argument("--skip-last", action="store_true",
                   help="exclude the final layer from backward (macro arg)")
    p.add_argument("--gradient-mode", default="quantized",
                   choices=["quantized", "float"])
    p.add_argument("--x", help=".npy float inputs [N, *input_shape]")
    p.add_argument("--y", help=".npy float targets [N, *output_shape]")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--load", help="warm-start params from a checkpoint .npz")
    p.add_argument("--save", help="write trained params to a checkpoint .npz")
    p.add_argument("--export", help="write the trained model back to a .tflite")
    p.add_argument("--backend", default=None)
    p.set_defaults(fn=cmd_train)

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
