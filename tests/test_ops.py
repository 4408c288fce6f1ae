"""Per-op golden tests against the reference's hand-computed unit-test
constants (``src/ops/*.rs`` ``#[cfg(test)]`` modules).  Every expected
integer output must match bit-for-bit.
"""

import jax.numpy as jnp
import numpy as np

from microflow_tpu.core import FusedActivation, ViewGeometry, ViewPadding
from microflow_tpu.ops import (
    average_pool_2d,
    conv_2d,
    depthwise_conv_2d,
    fully_connected,
    reshape,
    softmax,
)

F32 = np.float32
I32 = np.int32


def test_fully_connected_layer():
    # src/ops/fully_connected.rs:194-257
    x = jnp.array([[1, 2, 3], [4, 5, 6]], jnp.int8)
    w = jnp.array([[9, 10, 11, 12], [13, 14, 15, 16], [17, 18, 19, 20]], jnp.int8)
    c0 = np.array([-4.655_172_3, -3.724_138, -2.793_103_5, -1.862_069], F32)
    out = fully_connected(
        x,
        w,
        w_zp=22,
        bias0=F32(30) + c0,
        c1=F32(0.506_896_56),
        c2=np.array([312, 336, 360, 384], I32),
        c3=528,
        out_scale=0.29,
        out_zp=30,
        activation=FusedActivation.RELU,
    )
    expected = [[112, 103, 95, 87], [70, 67, 63, 60]]
    assert np.array_equal(np.asarray(out), expected)


def _nhwc(vals):
    """Build [1, R, C, CH] from the reference's matrix-of-channel-arrays."""
    return jnp.array([vals], jnp.int8)


def test_conv_2d_layer():
    # src/ops/conv_2d.rs:146-218
    x = _nhwc([[[1, 2], [3, 4], [5, 6]], [[7, 8], [9, 10], [11, 12]]])  # [1,2,3,2] zp 14
    filters = jnp.array(
        [
            [[[15, 16], [17, 18], [19, 20]], [[21, 22], [23, 24], [25, 26]]],
            [[[27, 28], [29, 30], [31, 32]], [[33, 34], [35, 36], [37, 38]]],
        ],
        jnp.int8,
    )  # [F=2, KH=2, KW=3, C=2], per-filter zp [41, 42]
    geom = ViewGeometry(
        in_rows=2, in_cols=3, k_rows=2, k_cols=3,
        out_rows=2, out_cols=3, stride_rows=1, stride_cols=1,
        padding=ViewPadding.SAME,
    )
    c0 = np.array([-3.673_469_4, -3.755_102], F32)
    out = conv_2d(
        x,
        filters,
        geom=geom,
        in_zp=14,
        w_zp=np.array([41, 42], I32),
        bias0=F32(50) + c0,
        c1=np.array([0.103_469_39, 0.106_122_45], F32),
        out_scale=0.49,
        out_zp=50,
        activation=FusedActivation.NONE,
    )
    expected = [[[127, 116], [127, 127], [127, 113]], [[98, 74], [114, 84], [82, 67]]]
    assert np.array_equal(np.asarray(out)[0], expected)


def test_depthwise_conv_2d_layer():
    # src/ops/depthwise_conv_2d.rs:143-209
    x = _nhwc([[[1, 2], [3, 4], [5, 6]], [[7, 8], [9, 10], [11, 12]]])  # zp 14
    weights = jnp.array(
        [[[15, 16], [17, 18], [19, 20]], [[21, 22], [23, 24], [25, 26]]], jnp.int8
    )  # [KH=2, KW=3, CH=2], per-channel zp [29, 30]
    geom = ViewGeometry(
        in_rows=2, in_cols=3, k_rows=2, k_cols=3,
        out_rows=2, out_cols=3, stride_rows=1, stride_cols=1,
        padding=ViewPadding.SAME,
    )
    c0 = np.array([-3.567_567_6, -3.675_675_7], F32)
    out = depthwise_conv_2d(
        x,
        weights,
        geom=geom,
        in_zp=14,
        w_zp=np.array([29, 30], I32),
        bias0=F32(38) + c0,
        c1=np.array([0.094_864_86, 0.098_378_378], F32),
        out_scale=0.37,
        out_zp=38,
        activation=FusedActivation.NONE,
    )
    expected = [[[66, 63], [82, 78], [65, 62]], [[47, 45], [52, 49], [44, 42]]]
    assert np.array_equal(np.asarray(out)[0], expected)


def test_average_pool_2d_layer():
    # src/ops/average_pool_2d.rs:99-145
    x = _nhwc([[[1, 2], [3, 4], [5, 6]], [[7, 8], [9, 10], [11, 12]]])  # zp 14
    geom = ViewGeometry(
        in_rows=2, in_cols=3, k_rows=2, k_cols=3,
        out_rows=2, out_cols=3, stride_rows=1, stride_cols=1,
        padding=ViewPadding.SAME,
    )
    out = average_pool_2d(
        x,
        geom=geom,
        c0=0.866_666_7,
        c1=3.866_666_6,
        out_scale=0.15,
        out_zp=16,
        activation=FusedActivation.NONE,
    )
    expected = [[[8, 9], [9, 10], [10, 11]], [[11, 12], [12, 13], [13, 13]]]
    assert np.array_equal(np.asarray(out)[0], expected)


def test_softmax_layer():
    # src/ops/softmax.rs:45-73 -- the reference normalizes over the WHOLE
    # buffer (``exp.map(expf).sum()``), so flatten the [2,3] test tensor to
    # one sample of 6; our batched op normalizes per batch row, which for
    # the reference's real [1,N] shapes is identical.
    x = jnp.array([[1, 2, 3, 4, 5, 6]], jnp.int8)  # scale 0.7 zp 8
    out = softmax(x, in_scale=0.7, out_scale=0.9, out_zp=10).reshape(2, 3)
    expected = [[10, 10, 10], [10, 10, 11]]
    assert np.array_equal(np.asarray(out), expected)


def test_reshape_roundtrip():
    # src/tensor.rs From impls: row-major NHWC flatten
    x4 = jnp.array(
        [
            [[[30, 34], [38, 42], [46, 50]], [[54, 58], [62, 66], [70, 74]]],
            [[[78, 82], [86, 90], [94, 98]], [[102, 106], [110, 114], [118, 122]]],
        ],
        jnp.int8,
    )  # [2, 2, 3, 2]
    x2 = reshape(x4, (12,))
    expected = [
        [30, 34, 38, 42, 46, 50, 54, 58, 62, 66, 70, 74],
        [78, 82, 86, 90, 94, 98, 102, 106, 110, 114, 118, 122],
    ]
    assert np.array_equal(np.asarray(x2), expected)
    back = reshape(x2, (2, 3, 2))
    assert np.array_equal(np.asarray(back), np.asarray(x4))
