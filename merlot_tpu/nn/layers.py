"""Small flax building blocks with the reference's numerics.

Mixed-precision contract everywhere (the JAX analogue of the reference's
``bfloat16_getter``, utils/model_utils.py:572-602): parameters are stored
fp32 ("master weights") and cast to the compute dtype (bf16 on TPU) at use.
flax's dtype/param_dtype split expresses this natively.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from merlot_tpu.ops import norms

Dtype = Any


def trunc_normal(stddev: float = 0.02):
    """Truncated-normal initializer matching tf.truncated_normal_initializer."""
    return nn.initializers.truncated_normal(stddev=stddev, lower=-2.0, upper=2.0)


class DenseTN(nn.Module):
    """Dense with truncated-normal(0.02) kernel init, fp32 params, bf16 compute."""
    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16
    initializer_range: float = 0.02
    bias_init: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, raw: bool = False):
        """raw=True returns the fp32 (kernel, bias) params instead of
        computing — for callers that fuse this projection into a combined
        op (ops.pallas_ln_matmul) while keeping the param tree identical."""
        kernel = self.param("kernel", trunc_normal(self.initializer_range),
                            (x.shape[-1], self.features), jnp.float32)
        bias = None
        if self.use_bias:
            binit = self.bias_init or nn.initializers.zeros
            bias = self.param("bias", binit, (self.features,), jnp.float32)
        if raw:
            return kernel, bias
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype),
                    preferred_element_type=self.dtype)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics (reference: utils/model_utils.py:113-130)."""
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, raw: bool = False):
        """raw=True returns the fp32 (gamma, beta) params instead of
        normalizing — for the fused LN+matmul path (same param tree)."""
        dim = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (dim,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (dim,), jnp.float32)
        if raw:
            return gamma, beta
        return norms.layer_norm(x, gamma, beta, self.epsilon)


class GroupNorm(nn.Module):
    """GroupNorm(32) with one-pass fp32 statistics (utils/model_utils.py:133-222).

    ``relu`` / ``residual`` fold the following activation / shortcut add
    into the same op. ``backend`` selects the implementation: the default
    is the unfused XLA composition (measured faster at MERLOT's shapes);
    'auto'/'pallas' use the fused one-pass kernel in ops/pallas_groupnorm
    where its VMEM budget allows."""
    num_groups: int = 32
    epsilon: float = 1e-4

    @nn.compact
    def __call__(self, x: jnp.ndarray, residual: Optional[jnp.ndarray] = None,
                 relu: bool = False,
                 backend: Optional[str] = None) -> jnp.ndarray:
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (c,), jnp.float32)
        from merlot_tpu.ops import pallas_groupnorm
        return pallas_groupnorm.group_norm_act(
            x, gamma, beta, residual=residual, num_groups=self.num_groups,
            epsilon=self.epsilon, relu=relu,
            backend=backend if backend is not None
            else pallas_groupnorm.BACKEND)


def _space_to_depth_fold(x: jnp.ndarray, kernel: jnp.ndarray, dtype,
                         bias=None) -> jnp.ndarray:
    """Stride-2 3x3 conv as a stride-1 2x2 conv over the s2d(2) input.

    With the reference's fixed_padding (pad (1,1) then VALID — see WSConv),
    output position p reads input rows {2p-1, 2p, 2p+1}. Writing input
    rows as blocks r = 2u + a (u block, a in {0,1}), those rows live in
    blocks {p-1, p}: a 2x2 window over the space-to-depth tensor
    X[u, v, (a, b, ci)], padded by one block at the top/left. The folded
    kernel W2[A, B, (a, b, ci), co] = kernel[2A+a-1, 2B+b-1, ci, co]
    (zero where an index is -1 — structural zeros, so every product that
    contributes is identical to the original conv's; only the summation
    order can differ by float non-associativity). Contraction dim per
    output: 9*cin -> 16*cin of which 9*cin nonzero."""
    b_, h, w, cin = x.shape
    co = kernel.shape[-1]
    X = x.reshape(b_, h // 2, 2, w // 2, 2, cin)
    X = X.transpose(0, 1, 3, 2, 4, 5).reshape(b_, h // 2, w // 2, 4 * cin)
    kp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))  # di=-1 -> row 0
    W2 = kp.reshape(2, 2, 2, 2, cin, co)          # [A, a, B, b, ci, co]
    W2 = W2.transpose(0, 2, 1, 3, 4, 5).reshape(2, 2, 4 * cin, co)
    X = jnp.pad(X, ((0, 0), (1, 0), (1, 0), (0, 0)))
    y = lax.conv_general_dilated(
        X.astype(dtype), W2.astype(dtype), window_strides=(1, 1),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype)
    if bias is not None:
        y = y + bias.astype(dtype)
    return y


class WSConv(nn.Module):
    """NHWC conv with optional weight standardization and fixed padding.

    Mirrors conv2d_fixed_padding (reference: utils/vision_transformer.py:30-66):
    stride>1 uses explicit symmetric padding + VALID; stride 1 uses SAME.
    The kernel is standardized in fp32 then cast to the compute dtype.
    """
    features: int
    kernel_size: int
    strides: int = 1
    weight_standardization: bool = True
    use_bias: bool = False
    padding: Optional[str] = None  # override; default per reference rule
    dtype: Dtype = jnp.bfloat16
    # TPU stem fix for MXU-starved small-Cin convs (the classic
    # space-to-depth transform): fold a stride-2 3x3 conv into a stride-1
    # 2x2 conv over the 2x2-space-to-depth input — the im2col contraction
    # dim grows 9*Cin -> 16*Cin (3->48 lanes of the MXU's 128 at the RGB
    # stem) while FLOPs/output and results are mathematically identical
    # (the folded kernel is the original kernel scattered with structural
    # zeros; see _space_to_depth_fold). Param tree UNCHANGED — the
    # rearrangement applies to the standardized kernel in the forward, so
    # checkpoints are untouched. Only defined for kernel_size 3, stride 2,
    # even spatial dims; silently falls back otherwise.
    space_to_depth: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        cin = x.shape[-1]
        # tf.variance_scaling_initializer() defaults: scale=1.0, fan_in,
        # truncated normal — what the reference's convs use.
        kernel = self.param(
            "kernel", nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (k, k, cin, self.features), jnp.float32)
        if self.weight_standardization:
            kernel = norms.standardize_kernel(kernel)

        if (self.space_to_depth and k == 3 and self.strides == 2
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
            bias = (self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32)
                    if self.use_bias else None)
            return _space_to_depth_fold(x, kernel, self.dtype, bias)

        if self.padding is not None:
            padding = self.padding
        elif self.strides > 1:
            # fixed_padding + VALID (image-size-independent)
            pad_total = k - 1
            pad_beg = pad_total // 2
            pad_end = pad_total - pad_beg
            x = jnp.pad(x, ((0, 0), (pad_beg, pad_end), (pad_beg, pad_end), (0, 0)))
            padding = "VALID"
        else:
            padding = "SAME"

        y = lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(self.strides, self.strides),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def _avg_pool_reshape(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """Exact window==stride pooling on evenly-divisible dims via reshape+mean.

    This is every pool MERLOT performs (stem 2x2/2, block-group 2x2/2,
    spatial 2x2/2 on even grids) — far cheaper for XLA than reduce_window
    and it fuses into neighbouring ops.
    """
    b, h, w, c = x.shape
    y = x.reshape(b, h // window, window, w // window, window, c)
    # window==2: accumulate in the INPUT dtype — jnp.mean's default f32
    # accumulation forces a full-size f32 materialization of the
    # (ReLU+cast) producer around every pool site, profiled at several
    # ms/step of pure HBM traffic in the ResNet stem (PERF.md round 4).
    # A 4-element bf16 mean loses <1 ulp and matches tf.nn.avg_pool's
    # bf16 accumulation (reference vision_transformer.py:84-90). Wider
    # windows sum window^2 values, so the rounding claim no longer holds:
    # accumulate those in f32 (no such call site exists today).
    acc = x.dtype if window <= 2 else jnp.float32
    return jnp.mean(y, axis=(2, 4), dtype=acc).astype(x.dtype)


def avg_pool_same(x: jnp.ndarray, window: int, stride: int) -> jnp.ndarray:
    """tf.nn.avg_pool2d(padding='SAME') on NHWC, with correct edge counts."""
    _, h, w, _ = x.shape
    if window == stride and h % window == 0 and w % window == 0:
        return _avg_pool_reshape(x, window)  # SAME == VALID when divisible
    ones = jnp.ones(x.shape[1:3], dtype=x.dtype)[None, :, :, None]
    summed = lax.reduce_window(x, jnp.asarray(0, x.dtype), lax.add,
                               (1, window, window, 1), (1, stride, stride, 1), "SAME")
    counts = lax.reduce_window(ones, jnp.asarray(0, x.dtype), lax.add,
                               (1, window, window, 1), (1, stride, stride, 1), "SAME")
    return summed / counts


def avg_pool_valid(x: jnp.ndarray, window: int, stride: int) -> jnp.ndarray:
    _, h, w, _ = x.shape
    if window == stride and h % window == 0 and w % window == 0:
        return _avg_pool_reshape(x, window)
    summed = lax.reduce_window(x, jnp.asarray(0, x.dtype), lax.add,
                               (1, window, window, 1), (1, stride, stride, 1), "VALID")
    return summed / jnp.asarray(window * window, x.dtype)
