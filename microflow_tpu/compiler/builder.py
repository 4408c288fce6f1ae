"""Graph builder: folded IR -> jittable batched JAX functions.

TPU-native analog of the reference's code generation step
(``microflow-macros/src/lib.rs:160-183``): where the proc-macro emits a
straight-line ``predict_inner`` with baked ``const`` weights, we close a
straight-line traced function over the layer IR.  Static attributes
(shapes, strides, folded scalars, quantization params) constant-fold into
the XLA program; trainable arrays (weights, C0 bias constants, FC's
derived C2) live in a params pytree so the training path can update them
and the serving path can donate/shard them.

The generated API mirrors the reference model struct:

* ``predict(x_f32)            -> f32``   (quantize -> layers -> dequantize)
* ``predict_quantized(x_int)  -> f32``
* ``predict_inner(x_int)      -> int``   (the raw quantized pipeline)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.numerics import f32
from ..core.quantize import dequantize, quantize
from ..core.tensor import reshape_2d
from ..ops import (
    average_pool_2d,
    conv_2d,
    depthwise_conv_2d,
    fully_connected,
    reshape,
    softmax,
)
from .ir import (
    AveragePool2DLayer,
    Conv2DLayer,
    DepthwiseConv2DLayer,
    FullyConnectedLayer,
    Graph,
    QuantizeLayer,
    ReshapeLayer,
    SoftmaxLayer,
)


def _broadcast_per_channel(values: np.ndarray, n: int, dtype) -> np.ndarray:
    """Reference ``.get(i).unwrap_or(arr[0])`` as a static broadcast."""
    return np.array([values[i] if i < len(values) else values[0] for i in range(n)], dtype)


def init_params(graph: Graph) -> dict:
    """Trainable/updatable arrays, keyed by layer index."""
    params = {}
    for layer in graph.layers:
        if isinstance(layer, FullyConnectedLayer):
            params[f"layer{layer.index}"] = {
                "weights": jnp.asarray(layer.weights),
                "c0": jnp.asarray(layer.c0),
                "c2": jnp.asarray(layer.c2),
            }
        elif isinstance(layer, Conv2DLayer):
            params[f"layer{layer.index}"] = {
                "weights": jnp.asarray(layer.filters),
                "c0": jnp.asarray(layer.c0),
            }
        elif isinstance(layer, DepthwiseConv2DLayer):
            params[f"layer{layer.index}"] = {
                "weights": jnp.asarray(layer.weights),
                "c0": jnp.asarray(layer.c0),
            }
    return params


def apply_layer(layer, params: dict, x: jax.Array, backend: str = "xla") -> jax.Array:
    """Run one IR layer (shared by inference and the training forward).

    ``backend="xla"`` uses the pure-jnp exact ops; ``backend="pallas"``
    routes FC / Conv(1x1 and im2col) / DWConv through the fused TPU
    kernels (identical numerics).
    """
    pallas = backend == "pallas"
    if isinstance(layer, FullyConnectedLayer):
        if layer.flatten_input:
            x = reshape_2d(x)
        p = params[f"layer{layer.index}"]
        bias0 = f32(layer.out_q.zp0) + p["c0"]
        if pallas:
            from ..kernels import qgemm

            n = layer.weights.shape[1]
            return qgemm(
                x,
                p["weights"],
                jnp.full((n,), layer.w_q.zp0, jnp.int32),
                jnp.int32(layer.c3) - p["c2"],
                bias0,
                jnp.full((n,), layer.c1, jnp.float32),
                activation=layer.activation,
                out_scale=float(layer.out_q.scale0),
                out_zp=layer.out_q.zp0,
            )
        return fully_connected(
            x,
            p["weights"],
            w_zp=layer.w_q.zp0,
            bias0=bias0,
            c1=layer.c1,
            c2=p["c2"],
            c3=layer.c3,
            out_scale=layer.out_q.scale0,
            out_zp=layer.out_q.zp0,
            activation=layer.activation,
        )
    if isinstance(layer, Conv2DLayer):
        p = params[f"layer{layer.index}"]
        num_f = layer.filters.shape[0]
        w_zp = _broadcast_per_channel(layer.w_q.zero_point, num_f, np.int32)
        bias0 = f32(layer.out_q.zp0) + p["c0"]
        c1 = _broadcast_per_channel(layer.c1, num_f, np.float32)
        if pallas:
            from ..core.tensor import extract_patches
            from ..kernels import qgemm

            geom = layer.geom
            in_zp = layer.in_q.zp0
            patches = extract_patches(x, geom, pad_value=in_zp)
            B = x.shape[0]
            k = layer.filters.shape[1] * layer.filters.shape[2] * layer.filters.shape[3]
            xg = patches.reshape(B * geom.out_rows * geom.out_cols, k)
            wg = p["weights"].reshape(num_f, k).T  # [K, F]
            colsum = jnp.sum(wg.astype(jnp.int32), axis=0)
            d = jnp.int32(k * in_zp) * jnp.asarray(w_zp) - jnp.int32(in_zp) * colsum
            y = qgemm(
                xg,
                wg,
                jnp.asarray(w_zp),
                d,
                bias0,
                jnp.asarray(c1),
                activation=layer.activation,
                out_scale=float(layer.out_q.scale0),
                out_zp=layer.out_q.zp0,
            )
            return y.reshape(B, geom.out_rows, geom.out_cols, num_f)
        return conv_2d(
            x,
            p["weights"],
            geom=layer.geom,
            in_zp=layer.in_q.zp0,
            w_zp=w_zp,
            bias0=bias0,
            c1=c1,
            out_scale=layer.out_q.scale0,
            out_zp=layer.out_q.zp0,
            activation=layer.activation,
        )
    if isinstance(layer, DepthwiseConv2DLayer):
        p = params[f"layer{layer.index}"]
        ch = layer.weights.shape[2]
        w_zp = _broadcast_per_channel(layer.w_q.zero_point, ch, np.int32)
        bias0 = f32(layer.out_q.zp0) + p["c0"]
        c1 = _broadcast_per_channel(layer.c1, ch, np.float32)
        if pallas:
            from ..kernels import qdwconv

            geom = layer.geom
            in_zp = layer.in_q.zp0
            in_c = x.shape[-1]
            if in_c != ch:
                # reference channel fallback (depth-multiplier case)
                chan_idx = np.array([c if c < in_c else 0 for c in range(ch)])
                x = x[..., chan_idx]
            top, bottom, left, right = geom.pad_amounts()
            xp = jnp.pad(
                x,
                ((0, 0), (top, bottom), (left, right), (0, 0)),
                constant_values=np.asarray(in_zp, x.dtype),
            )
            wc = p["weights"].astype(jnp.int32) - jnp.asarray(w_zp)[None, None, :]
            d = -jnp.int32(in_zp) * jnp.sum(wc, axis=(0, 1))
            return qdwconv(
                xp,
                wc,
                d,
                bias0,
                jnp.asarray(c1),
                kh=geom.k_rows, kw=geom.k_cols,
                sr=geom.stride_rows, sc=geom.stride_cols,
                oh=geom.out_rows, ow=geom.out_cols,
                activation=layer.activation,
                out_scale=float(layer.out_q.scale0),
                out_zp=layer.out_q.zp0,
            )
        return depthwise_conv_2d(
            x,
            p["weights"],
            geom=layer.geom,
            in_zp=layer.in_q.zp0,
            w_zp=w_zp,
            bias0=bias0,
            c1=c1,
            out_scale=layer.out_q.scale0,
            out_zp=layer.out_q.zp0,
            activation=layer.activation,
        )
    if isinstance(layer, AveragePool2DLayer):
        return average_pool_2d(
            x,
            geom=layer.geom,
            c0=layer.c0,
            c1=layer.c1,
            out_scale=layer.out_q.scale0,
            out_zp=layer.out_q.zp0,
            activation=layer.activation,
        )
    if isinstance(layer, SoftmaxLayer):
        if x.ndim > 2:
            x = reshape_2d(x)
        return softmax(
            x,
            in_scale=layer.in_q.scale0,
            out_scale=layer.out_q.scale0,
            out_zp=layer.out_q.zp0,
        )
    if isinstance(layer, ReshapeLayer):
        return reshape(x, layer.out_shape)
    if isinstance(layer, QuantizeLayer):
        from ..ops.quantize_op import quantize_op

        return quantize_op(
            x,
            in_scale=layer.in_q.scale0,
            in_zp=layer.in_q.zp0,
            out_scale=layer.out_q.scale0,
            out_zp=layer.out_q.zp0,
            out_dtype=layer.out_dtype.type,
        )
    raise TypeError(f"unknown layer {type(layer)}")


# Supported backends: the production matrix.  Any change to ops/,
# kernels/, compiler/folding.py, or core/numerics.py must keep THESE
# green (CLAUDE.md invariant).
BACKENDS = frozenset({"auto", "xla", "pallas", "flat"})

# Experimental backends: measured losers kept as design witnesses
# (Mosaic-legality notes in their module docstrings; postmortems in
# docs/PERFORMANCE.md items 2/5/7 and round 5).  Constructible on
# request, parity tests gated behind MFT_TEST_EXPERIMENTAL=1 (colfc's
# interpret parity runs ungated -- it is seconds), excluded from the
# supported matrix, parity.csv, and the ops/-change invariant.
EXPERIMENTAL_BACKENDS = frozenset({"fused", "hybrid", "packed", "colfc"})

ALL_BACKENDS = BACKENDS | EXPERIMENTAL_BACKENDS


def default_backend() -> str:
    """Backend selection.

    Supported set (``BACKENDS``):

    * ``auto`` (default; override with env ``MFT_BACKEND``) -- on TPU,
      graphs WITH conv layers that flat-pack get the flat whole-network
      kernel; everything else (incl. pure-FC graphs like sine) gets
      ``xla``.  Measured on v5e (scripts/ab_flat.py, round 3): flat is
      1.118x XLA on person_detect at tb=768 and 1.87x on speech (the dw
      C=8 layer escapes NHWC tile padding), but 0.56x on sine (3 tiny
      matmuls; K=1 rows waste 128-wide windows), hence the conv gate.
    * ``flat`` -- the flat-sample whole-network Pallas kernel
      (``kernels/flatpack.py``): batch on sublanes, the whole sample on
      lanes; one ``pallas_call`` covers every layer incl. pool/FC/softmax.
      The production path on TPU for conv graphs; bit-exact.
    * ``xla`` -- exact integer ops lowered by XLA (int8 lax.conv + fused
      requant epilogues).  The parity oracle every other backend is
      tested against, and the fallback for non-packable graphs.
    * ``pallas`` -- per-op fused kernels (qgemm/qdwconv), bit-identical;
      kept for op-level use and comparison (~2.8x slower end-to-end).

    Experimental set (``EXPERIMENTAL_BACKENDS``; measured losers, kept
    as design witnesses -- docs/PERFORMANCE.md): ``fused`` (whole-model
    VMEM megakernel, 16x slower -- Mosaic lane waste on small C),
    ``hybrid`` (XLA prefix + megakernel tail, 2x slower), ``packed``
    (WC-packed guard-row pipeline, 2.4x slower).
    """
    import os

    backend = os.environ.get("MFT_BACKEND", "auto")
    if backend not in ALL_BACKENDS:
        raise ValueError(
            f"MFT_BACKEND={backend!r} is not a known backend; "
            f"choose one of {sorted(BACKENDS)} "
            f"(experimental: {sorted(EXPERIMENTAL_BACKENDS)})"
        )
    return backend


class CompiledModel:
    """The built model: batched, jitted, params as a pytree."""

    def __init__(self, graph: Graph, backend: str | None = None):
        self.graph = graph
        self.backend = backend or default_backend()
        if self.backend not in ALL_BACKENDS:
            raise ValueError(
                f"unknown backend {self.backend!r}; choose one of "
                f"{sorted(BACKENDS)} (experimental: {sorted(EXPERIMENTAL_BACKENDS)})"
            )
        self._fused_forward = None
        self._packed = None
        self._flat = None
        self._colfc = None
        if self.backend == "colfc":
            import os

            from ..kernels.colfc import build_col_kernel

            tb = int(os.environ.get("MFT_COLFC_TB", "32"))
            res = build_col_kernel(graph, tb=tb)
            if res is None:
                raise ValueError(
                    "graph is not a colfc-packable tiny-FC chain; use "
                    "backend='xla'")
            self._colfc = res
        if self.backend == "packed":
            import os

            from ..kernels.packed import build_packed_kernel

            tb = int(os.environ.get("MFT_PACKED_TB", "8"))
            ml = os.environ.get("MFT_PACKED_LAYERS")
            res = build_packed_kernel(graph, tb=tb, max_layers=int(ml) if ml else None)
            if res is None:
                raise ValueError("graph is not packable; use backend='xla'")
            self._packed = res
            self._packed_tb = tb
        if self.backend == "auto":
            # production default: the flat whole-network kernel when on
            # TPU and the graph packs; the exact XLA ops otherwise.
            # Pure-FC graphs stay on XLA even when they pack: measured
            # on v5e, flat wins 1.87x on speech (dw C=8 escapes NHWC
            # tile padding) but loses 0.56x on sine (3 tiny matmuls,
            # K=1 rows in 128-wide windows) -- scripts/ab_flat.py,
            # docs/PERFORMANCE.md "Round 3".
            self.backend = "xla"
            has_conv = any(
                isinstance(l, (Conv2DLayer, DepthwiseConv2DLayer))
                for l in graph.layers)
            if jax.default_backend() == "tpu" and has_conv:
                res = self._build_flat(graph)
                if res is not None:
                    self.backend = "flat"
                    self._flat = res
        elif self.backend == "flat":
            res = self._build_flat(graph)
            if res is None:
                raise ValueError("graph is not flat-packable; use backend='xla'")
            self._flat = res
        if self.backend in ("fused", "hybrid"):
            from ..kernels.megakernel import (
                build_fused_forward,
                fusable,
                hybrid_split_index,
            )

            if not fusable(graph):
                raise ValueError("graph is not megakernel-fusable; use backend='xla'")
            start = hybrid_split_index(graph) if self.backend == "hybrid" else 0
            self._fused_forward = build_fused_forward(graph, start_index=start)
        self.params = init_params(graph)
        self._jit_predict = jax.jit(self._predict_from_quantized)
        self._jit_inner = jax.jit(self._forward)
        self._warmed: dict = {}  # batch_size -> compiled executable

    def _build_flat(self, graph: Graph):
        """Build the flat whole-network kernel, auto-sizing the batch
        tile to the VMEM budget; None if the graph doesn't pack."""
        import os

        from ..kernels.flatpack import LANE, build_flat_kernel, plan_flat

        ml = os.environ.get("MFT_FLAT_LAYERS")
        mw = int(os.environ.get("MFT_FLAT_WINDOW", "2048"))
        rq = os.environ.get("MFT_FLAT_REQUANT", "exact2")
        max_layers = int(ml) if ml else None
        plan = plan_flat(graph, max_layers=max_layers, max_window=mw)
        if plan is None:
            return None
        ops, _, meta = plan
        tb_env = os.environ.get("MFT_FLAT_TB")
        if tb_env:
            tb = int(tb_env)
        else:
            consts = sum(m.nbytes for op in ops for m in op.mats)
            consts += sum(p.nbytes for op in ops
                          for p in (op.d_plane, op.bias_plane, op.c1_plane,
                                    op.r_plane, op.sm_mask, op.db_plane,
                                    op.m_plane)
                          if p is not None)
            consts += sum(p.nbytes for op in ops for p in op.tap_planes)
            scratch = max((op.lanes_out_p for op in ops[:-1]), default=LANE)
            per_row = 2 * scratch + meta["in_lanes_p"] + meta["out_lanes_p"]
            budget = 90 * 2**20 - consts
            tb = 128
            for cand in (768, 512, 256):
                if cand * per_row <= budget:
                    tb = cand
                    break
        res = build_flat_kernel(graph, tb=tb, max_layers=max_layers,
                                max_window=mw, requant=rq)
        if res is not None:
            self._flat_tb = tb
        return res

    # --- traced bodies ---

    def _forward(self, params, xq):
        if self._fused_forward is not None:
            return self._fused_forward(params, xq)
        if self._packed is not None:
            return self._packed_forward(params, xq)
        if self._colfc is not None:
            return self._colfc_forward(params, xq)
        if self._flat is not None:
            return self._flat_forward(params, xq)
        for layer in self.graph.layers:
            xq = apply_layer(layer, params, xq, self.backend)
        return xq

    def _flat_forward(self, params, xq):
        """Flat-sample kernel (kernels/flatpack.py) on the conv prefix,
        XLA ops on the tail.  Weights live in the kernel's constant
        operands; ``params`` feeds only the tail layers."""
        flat_fn, n_layers, meta = self._flat
        b = xq.shape[0]
        tb = self._flat_tb
        pad = (-b) % tb
        x2 = xq.reshape(b, meta["in_lanes"])
        if pad:
            x2 = jnp.concatenate(
                [x2, jnp.zeros((pad, meta["in_lanes"]), x2.dtype)], axis=0)
        off = meta["out_off"]
        y = flat_fn(x2)[:b, off : off + meta["out_lanes"]]
        x = y.reshape(b, *meta["out_shape"])
        for layer in self.graph.layers[n_layers:]:
            x = apply_layer(layer, params, x, "xla")
        return x

    def _colfc_forward(self, params, xq):
        """Column-FC kernel (kernels/colfc.py): batch on lanes.  Weights
        live in the kernel's constant operands; ``params`` is unused
        (kept for the uniform traced signature)."""
        col_fn, meta = self._colfc
        b = xq.shape[0]
        pad = (-b) % meta["tile"]
        xt = xq.reshape(b, meta["k0"]).T
        if pad:
            xt = jnp.concatenate(
                [xt, jnp.zeros((meta["k0"], pad), xt.dtype)], axis=1)
        y = col_fn(xt)[:, :b].T  # [b, n_out]
        return y.reshape(b, *self.graph.output_shape)

    def _packed_forward(self, params, xq):
        """Packed-pipeline kernel on the dw/pw prefix, XLA ops on the
        tail.  Weights live inside the kernel's constant operands, so
        ``params`` is only consulted for the tail layers.  The guard-row
        prep (zp rows bracketing each sample) and the final strip are
        cheap dense XLA copies."""
        packed_fn, n_layers, meta = self._packed
        b = xq.shape[0]
        tb = self._packed_tb
        pad = (-b) % tb
        in_zp = self.graph.layers[0].in_q.zp0
        x3 = xq.reshape(b, meta["in_rows"], meta["in_cols"])
        if pad:
            x3 = jnp.concatenate([x3, jnp.zeros((pad, *x3.shape[1:]), x3.dtype)], axis=0)
        bp = b + pad
        g = jnp.full((bp, 1, meta["in_cols"]), np.int8(in_zp), x3.dtype)
        x2 = jnp.concatenate([g, x3, g], axis=1).reshape(bp * (meta["in_rows"] + 2),
                                                        meta["in_cols"])
        y = packed_fn(x2)
        hp = meta["h_out"] + 2
        y = y.reshape(bp, hp, meta["lanes_out"])[:b, 1 : 1 + meta["h_out"], :]
        x = y.reshape(b, meta["h_out"], meta["w_out"], meta["c_out"])
        for layer in self.graph.layers[n_layers:]:
            x = apply_layer(layer, params, x, "xla")
        return x

    def _predict_from_quantized(self, params, xq):
        yq = self._forward(params, xq)
        return dequantize(yq, self.graph.output_q.scale0, self.graph.output_q.zp0)

    # --- public API (mirrors the reference generated model struct) ---

    def quantize_input(self, x) -> jax.Array:
        g = self.graph
        return quantize(
            jnp.asarray(x, jnp.float32),
            g.input_q.scale0,
            g.input_q.zp0,
            dtype=g.input_dtype.type,
        )

    def warm(self, batch_size: int, cache: bool = True):
        """Pre-compile ``predict`` for a fixed batch size; with
        ``cache=True`` the executable persists in the engine's
        HLO-keyed cache (utils/cache.py) so later processes skip the
        minutes-long flat-kernel compile.  The serving analog of the
        reference's ahead-of-time ``model!`` macro expansion: after
        ``warm(b)``, predict/predict_quantized on exactly batch ``b``
        dispatch to the warmed executable."""
        xq = jnp.zeros((batch_size, *self.graph.input_shape),
                       self.graph.input_dtype.type)
        if cache:
            from ..utils.cache import cached_executable

            exe = cached_executable(
                self._predict_from_quantized, self.params, xq,
                name=f"predict_{self.graph.name}_{batch_size}")
        else:
            exe = jax.jit(self._predict_from_quantized).lower(
                self.params, xq).compile()
        self._warmed[batch_size] = exe
        return exe

    def predict(self, x) -> jax.Array:
        """f32 [B, *input_shape] -> f32 [B, *output_shape]."""
        return self._dispatch(self.quantize_input(x))

    def predict_quantized(self, xq) -> jax.Array:
        """int [B, *input_shape] -> f32 [B, *output_shape]."""
        return self._dispatch(jnp.asarray(xq))

    def _dispatch(self, xq) -> jax.Array:
        exe = self._warmed.get(xq.shape[0]) if self._warmed else None
        if exe is not None:
            return exe(self.params, xq)
        return self._jit_predict(self.params, xq)

    def predict_inner(self, xq) -> jax.Array:
        """int [B, *input_shape] -> int [B, *output_shape]."""
        return self._jit_inner(self.params, jnp.asarray(xq))

    def export(self, path: str | None = None) -> bytes:
        """Serialize the model -- with its CURRENT params, including any
        training updates -- back to ``.tflite`` bytes
        (``frontend/export.py``).  Untrained models round-trip
        bit-exactly; trained folded biases are quantized to the nearest
        integer bias on export.  Writes to ``path`` when given."""
        from ..frontend.export import export_tflite

        params = jax.tree_util.tree_map(np.asarray, self.params)
        data = export_tflite(self.graph, params,
                             description=f"microflow_tpu export: {self.graph.name}")
        if path:
            with open(path, "wb") as f:
                f.write(data)
        return data

    def expansion(self, batch_size: int = 1) -> str:
        """Debug artifact: the traced program (reference dumps its macro
        expansion to ``target/microflow-expansion.rs``)."""
        g = self.graph
        xq = jax.ShapeDtypeStruct((batch_size, *g.input_shape), g.input_dtype.type)
        return str(jax.make_jaxpr(self._predict_from_quantized)(self.params, xq))


def build(graph: Graph, backend: str | None = None) -> CompiledModel:
    return CompiledModel(graph, backend=backend)


def compile_tflite(path: str, name: str | None = None, backend: str | None = None) -> CompiledModel:
    """One-call front door: ``.tflite`` path -> compiled batched model."""
    from ..frontend.parser import parse

    return build(parse(path, name=name), backend=backend)
