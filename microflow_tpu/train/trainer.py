"""TrainableModel: the generated-train-struct equivalent (reference T1,
``microflow-train-macros/src/lib.rs:53-270``).

``TrainableModel(graph, num_train_layers, loss, skip_last_layer_train)``
mirrors ``#[model(path, num_train_layers, loss, skip_last_layer_train)]``:
the last ``num_train_layers`` operators form the trainable suffix (the
frozen prefix runs plain inference); ``skip_last_layer_train`` excludes
the final operator (typically SOFTMAX) from backward/update while the
loss is computed on the tensor *before* it.

API parity:
* ``predict(x)`` / ``predict_quantized(x)`` -- inference
* ``predict_train(x, gt_q, lr)`` -- forward + backward, accumulates
  integer gradients (state on the object, like the generated struct's
  ``weightsN_gradient`` fields), returns the dequantized pre-loss output
* ``update_layers(batch_size, lr)`` -- clip-norm SGD on FC weights,
  plain SGD on conv/dwconv weights, f32 step on the folded bias C0,
  re-fold of FC's C2, gradient zeroing

The whole train step is one jitted function; gradient state is a pytree,
so it shards/donates like params.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..compiler.builder import CompiledModel, apply_layer
from ..compiler.ir import (
    AveragePool2DLayer,
    Conv2DLayer,
    DepthwiseConv2DLayer,
    FullyConnectedLayer,
    Graph,
    ReshapeLayer,
    SoftmaxLayer,
)
from ..compiler.builder import _broadcast_per_channel
from ..core.numerics import f32
from ..core.quantize import dequantize
from ..core.tensor import reshape_2d
from . import gradients, losses, optimizer


class TrainableModel(CompiledModel):
    def __init__(
        self,
        graph: Graph,
        num_train_layers: int,
        loss: str = "mse",
        skip_last_layer_train: bool = False,
        backend: str | None = None,
        gradient_mode: str = "quantized",
    ):
        # training default is the per-layer XLA path: the train step is
        # per-layer regardless of backend, and the "auto" default would
        # spend minutes Mosaic-compiling a flat inference kernel the
        # trainer rarely amortizes; pass backend="auto"/"flat" to opt in
        super().__init__(graph, backend=backend or "xla")
        if loss not in ("mse", "crossentropy"):
            raise NotImplementedError(f"loss {loss!r}")
        self.loss = loss
        n = len(graph.layers)
        self.train_indices = [l.index for l in graph.layers[n - num_train_layers :]]
        self.backward_indices = list(self.train_indices)
        if skip_last_layer_train and self.backward_indices:
            self.backward_indices = self.backward_indices[:-1]
        # loss reads the output of the last *backward* layer
        # (``lib.rs:209-215``)
        self.loss_index = self.backward_indices[-1] if self.backward_indices else None
        # gradient_mode="float": end-to-end run of the reference's
        # "unquantized" f32 gradient twins (gradient_fully_connected.rs:118-152,
        # :198-232, :268-299).  The reference computes those twins but its
        # orchestration is commented out (:42-50) and FC-only, so this
        # mode is our completion of that experiment: f32 gradients flow
        # through the suffix, FC weight grads accumulate in f32, and the
        # update converts them onto the int8 grid (optimizer.
        # update_weights_2d_from_float).  Scope matches the reference:
        # FC (+shape-only reshape/softmax) suffixes only.
        if gradient_mode not in ("quantized", "float"):
            raise ValueError(f"gradient_mode {gradient_mode!r}")
        self.gradient_mode = gradient_mode
        if gradient_mode == "float":
            for i in self.backward_indices:
                if not isinstance(
                    graph.layers[i],
                    (FullyConnectedLayer, ReshapeLayer, SoftmaxLayer),
                ):
                    raise NotImplementedError(
                        "gradient_mode='float' covers FC suffixes only (the "
                        "reference's unquantized twins exist only for FC, "
                        "gradient_fully_connected.rs:118-299); layer "
                        f"{i} is {type(graph.layers[i]).__name__}"
                    )
        self.grads = self._init_grads()
        self._md_small = self._derive_md_bounds()
        # running host-side bound on |weights_gradient| entries: grads
        # start zeroed and every step's per-sample conv/dw gradients are
        # int8, so after steps adding 127*B_i each, every fold prefix is
        # bounded by this value -- while it stays under 2**31 the plain
        # sum is STATICALLY bit-equal to the saturating fold and the
        # train step traces with no cond at all (fold_mode="fast").
        # None = unknown provenance (e.g. externally assigned grads):
        # the runtime-checked cond path is used until the next
        # update_layers zeroes the accumulators.
        self._fold_bound: int | None = 0
        self._jit_train = jax.jit(self._train_step, static_argnames=("fold_mode",))
        self._jit_update = jax.jit(self._update_step, static_argnames=("batch_size", "lr"))

    # --- gradient state (the generated struct's *_gradient fields) ---

    def _init_grads(self) -> dict:
        grads = {}
        for layer in self.graph.layers:
            if layer.index not in self.backward_indices:
                continue
            if isinstance(layer, FullyConnectedLayer):
                wg_dtype = (
                    jnp.float32 if self.gradient_mode == "float" else jnp.int32
                )
                grads[f"layer{layer.index}"] = {
                    "weights_gradient": jnp.zeros(layer.weights.shape, wg_dtype),
                    "c0_gradient": jnp.zeros(layer.c0.shape, jnp.float32),
                }
            elif isinstance(layer, Conv2DLayer):
                grads[f"layer{layer.index}"] = {
                    "weights_gradient": jnp.zeros(layer.filters.shape, jnp.int32),
                    "c0_gradient": jnp.zeros(layer.c0.shape, jnp.float32),
                }
            elif isinstance(layer, DepthwiseConv2DLayer):
                grads[f"layer{layer.index}"] = {
                    "weights_gradient": jnp.zeros(layer.weights.shape, jnp.int32),
                    "c0_gradient": jnp.zeros(layer.c0.shape, jnp.float32),
                }
        return grads

    def _derive_md_bounds(self) -> dict:
        """Static per-layer bound on the incoming gradient magnitude,
        walked in backward execution order.  Returns
        {layer_index: md_small bool}; md_small permits the exact
        int8-split MXU einsums in ``gradients.conv_backward_sample``.

        The algebra (each step provable from the kernels themselves):

        * loss gradients are differences of int8-grid values:
          |mse_grad| = |pred - gt| <= 255; |crossentropy_grad| =
          |quantized softmax - label| <= 255;
        * a conv layer's outgoing dIn is round_away(sum(md*wc)/sum|md|)
          over the SAME md set -- a weighted average of centered
          weights, so |dIn| <= max|wc| <= 255 (NaN -> 0; dw divides by
          the UNMASKED |d_out| total >= the masked sum, same bound);
        * avgpool backward adds md once per covering window:
          bound *= max window cover (1 for global pools);
        * FC backward dIn is an unnormalized dot: bound *= 255 * K;
        * reshape passes the buffer through; softmax is forward-only.
        """
        bound: float = 255.0
        small: dict = {}
        graph = self.graph
        for layer in reversed([graph.layers[i] for i in self.backward_indices]):
            small[layer.index] = bound <= 255.0
            if isinstance(layer, (Conv2DLayer, DepthwiseConv2DLayer)):
                bound = 255.0
            elif isinstance(layer, AveragePool2DLayer):
                g = layer.geom
                cover = np.zeros((g.in_rows, g.in_cols), np.int64)
                mask = g.valid_mask_plane()  # [OH, OW, KH, KW]
                for i in range(g.out_rows):
                    for j in range(g.out_cols):
                        r0, c0 = g.origin(i, j)
                        for m in range(g.k_rows):
                            for n in range(g.k_cols):
                                if mask[i, j, m, n]:
                                    cover[r0 + m, c0 + n] += 1
                bound *= float(cover.max(initial=1))
            elif isinstance(layer, FullyConnectedLayer):
                bound *= 255.0 * layer.weights.shape[1]
            # reshape/softmax: unchanged
        return small

    # --- traced training step ---

    def _train_step(self, params, grads, xq, gt_q, fold_mode="checked"):
        graph = self.graph
        # forward, saving (input, output) of every backward layer
        acts = {}
        x = xq
        for layer in graph.layers:
            y = apply_layer(layer, params, x, self.backend)
            if layer.index in self.backward_indices or layer.index == self.loss_index:
                acts[layer.index] = (x, y)
            x = y
        final = x
        loss_out = acts[self.loss_index][1]

        # initial backward gradient from the loss (T9)
        if self.loss == "mse":
            g = losses.mse_grad(loss_out, gt_q)
        else:
            loss_layer = graph.layers[self.loss_index]
            g = losses.crossentropy_grad(
                loss_out,
                graph.output_q.scale0,
                graph.output_q.zp0,
                gt_q,
                in_scale=loss_layer.out_q.scale0,
            )

        if self.gradient_mode == "float":
            # the dequantized-domain twin of the initial gradient: both
            # losses' quantized gradients are (pred - target) deltas on
            # the loss tensor's grid, so scaling by that grid's step
            # size is the exact f32 counterpart
            loss_layer = graph.layers[self.loss_index]
            g = jnp.float32(loss_layer.out_q.scale0) * f32(g)

        # backward in reverse layer order (T1's token prepending)
        new_grads = dict(grads)
        # conv/dw weight-gradient accumulations are deferred to ONE
        # bound-checked cond after the loop (optimizer.
        # accumulate_gradient_4d_fold_many): a per-layer cond is a
        # fusion barrier measured at ~1.2 ms/step @B=1024
        deferred_folds: list = []
        for layer in reversed([graph.layers[i] for i in self.backward_indices]):
            lg = dict(new_grads.get(f"layer{layer.index}", {}))
            x_in, y_out = acts[layer.index]
            if isinstance(layer, FullyConnectedLayer):
                x2 = reshape_2d(x_in) if layer.flatten_input else x_in
                backward = (
                    gradients.fc_backward_float
                    if self.gradient_mode == "float"
                    else gradients.fc_backward
                )
                dW, bias_grad, g = backward(
                    layer, x2, y_out, params[f"layer{layer.index}"]["weights"], g
                )
                if self.gradient_mode == "float":
                    # plain f32 accumulation (the twin of the integer
                    # path's saturating accumulate_gradient_2D)
                    lg["weights_gradient"] = lg["weights_gradient"] + dW
                else:
                    lg["weights_gradient"] = optimizer.accumulate_gradient_2d(
                        dW, lg["weights_gradient"]
                    )
                lg["c0_gradient"] = lg["c0_gradient"] + bias_grad
                if layer.flatten_input:
                    g = g.reshape(x_in.shape)
            elif isinstance(layer, Conv2DLayer):
                w_zp = _broadcast_per_channel(
                    layer.w_q.zero_point, layer.filters.shape[0], np.int32
                )
                fn = functools.partial(
                    gradients.conv_backward_sample,
                    layer,
                    weights=params[f"layer{layer.index}"]["weights"],
                    w_zp_vec=w_zp,
                    md_small=self._md_small.get(layer.index, False),
                )
                dW_b, _bias_b, g = jax.vmap(lambda xi, yi, gi: fn(xi, yi, d_out=gi))(
                    x_in, y_out, g
                )
                # per-sample saturating accumulation, in batch order
                # (serial-fold semantics; deferred into the one-cond
                # fast path -- docs/PERFORMANCE.md rounds 4-5)
                deferred_folds.append((f"layer{layer.index}", dW_b))
                # conv bias update is disabled in the reference
                # (gradient_conv_2d.rs:63 commented out)
            elif isinstance(layer, DepthwiseConv2DLayer):
                w_zp = _broadcast_per_channel(
                    layer.w_q.zero_point, layer.weights.shape[2], np.int32
                )
                fn = functools.partial(
                    gradients.dwconv_backward_sample,
                    layer,
                    weights=params[f"layer{layer.index}"]["weights"],
                    w_zp_vec=w_zp,
                )
                dW_b, bias_b, g = jax.vmap(lambda xi, yi, gi: fn(xi, yi, d_out=gi))(
                    x_in, y_out, g
                )
                deferred_folds.append((f"layer{layer.index}", dW_b))
                lg["c0_gradient"] = lg["c0_gradient"] + jnp.sum(bias_b, axis=0)
            elif isinstance(layer, AveragePool2DLayer):
                g = jax.vmap(
                    lambda yi, gi: gradients.avgpool_backward_sample(layer, yi, gi)
                )(y_out, g)
            elif isinstance(layer, (ReshapeLayer, SoftmaxLayer)):
                if isinstance(layer, ReshapeLayer):
                    g = g.reshape(x_in.shape)  # T8: reshape the gradient
                # softmax: forward-only even in train mode (T7)
            if lg:
                new_grads[f"layer{layer.index}"] = lg
        if deferred_folds:
            pairs = [(d, new_grads[key]["weights_gradient"])
                     for key, d in deferred_folds]
            if fold_mode == "fast":
                # caller proved no prefix can clamp (host-side running
                # bound, see __init__): the plain sum is bit-equal and
                # the step carries no cond/fusion barrier
                outs = [acc.astype(jnp.int32)
                        + jnp.sum(d.astype(jnp.int32), axis=0)
                        for d, acc in pairs]
            else:
                outs = optimizer.accumulate_gradient_4d_fold_many(pairs)
            for (key, _), res in zip(deferred_folds, outs):
                new_grads[key] = dict(new_grads[key],
                                      weights_gradient=res)
        return final, loss_out, new_grads

    # --- traced update step (T3-T5 update_ops) ---

    def _update_step(self, params, grads, *, batch_size: int, lr: float):
        new_params = dict(params)
        new_grads = dict(grads)
        for i in self.backward_indices:
            layer = self.graph.layers[i]
            key = f"layer{i}"
            if key not in grads:
                continue
            p, g = dict(new_params[key]), dict(new_grads[key])
            if isinstance(layer, FullyConnectedLayer):
                if self.gradient_mode == "float":
                    p["weights"] = optimizer.update_weights_2d_from_float(
                        p["weights"],
                        g["weights_gradient"],
                        layer.w_q.scale0,
                        batch_size,
                        lr,
                    )
                else:
                    p["weights"] = optimizer.update_weights_clip_norm_2d(
                        p["weights"], g["weights_gradient"], batch_size, lr
                    )
                p["c0"] = optimizer.update_weights_2d_float(
                    p["c0"], g["c0_gradient"], batch_size, lr
                )
                p["c2"] = optimizer.update_constants_fully_connected(
                    p["weights"], layer.in_q.zp0
                )
            elif isinstance(layer, (Conv2DLayer, DepthwiseConv2DLayer)):
                p["weights"] = optimizer.update_weights_4d(
                    p["weights"], g["weights_gradient"], batch_size, lr
                )
                p["c0"] = optimizer.update_weights_2d_float(
                    p["c0"], g["c0_gradient"], batch_size, lr
                )
            g["weights_gradient"] = jnp.zeros_like(g["weights_gradient"])
            g["c0_gradient"] = jnp.zeros_like(g["c0_gradient"])
            new_params[key], new_grads[key] = p, g
        return new_params, new_grads

    # --- public API (mirrors the generated train struct) ---

    def predict_train(self, x, gt_q, learning_rate: float = 0.0):
        """f32 input + quantized ground truth -> dequantized pre-loss
        output.  Accumulates gradients on the object (like the generated
        struct's mutable fields)."""
        xq = self.quantize_input(x)
        return self.predict_quantized_train(xq, gt_q, learning_rate)

    def predict_quantized_train(self, xq, gt_q, learning_rate: float = 0.0):
        xq = jnp.asarray(xq)
        step_add = 127 * int(xq.shape[0])
        safe = (self._fold_bound is not None
                and self._fold_bound + step_add < 2**31)
        final, loss_out, self.grads = self._jit_train(
            self.params, self.grads, xq, jnp.asarray(gt_q),
            fold_mode="fast" if safe else "checked",
        )
        self._fold_bound = (self._fold_bound + step_add) if safe else None
        loss_layer = self.graph.layers[self.loss_index]
        return dequantize(loss_out, loss_layer.out_q.scale0, loss_layer.out_q.zp0)

    def update_layers(self, batch_size: int, learning_rate: float):
        self.params, self.grads = self._jit_update(
            self.params, self.grads, batch_size=batch_size, lr=learning_rate
        )
        self._fold_bound = 0  # accumulators zeroed (update_ops semantics)

    def quantize_target(self, y) -> jax.Array:
        """Quantize a float target with the loss tensor's output params
        (the examples do this by hand, ``sine_train.rs:41-46``)."""
        from ..core.quantize import quantize

        layer = self.graph.layers[self.loss_index]
        return quantize(
            jnp.asarray(y, jnp.float32),
            layer.out_q.scale0,
            layer.out_q.zp0,
            dtype=self.graph.output_dtype.type,
        )


def compile_tflite_train(
    path: str,
    num_train_layers: int,
    loss: str = "mse",
    skip_last_layer_train: bool = False,
    name: str | None = None,
    backend: str | None = None,
    gradient_mode: str = "quantized",
) -> TrainableModel:
    """Front door mirroring ``#[model(path, n, loss, skip)]``."""
    from ..frontend.parser import parse

    return TrainableModel(
        parse(path, name=name), num_train_layers, loss, skip_last_layer_train,
        backend=backend, gradient_mode=gradient_mode,
    )
