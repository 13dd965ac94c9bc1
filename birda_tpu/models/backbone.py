"""EfficientNet-style audio classifier backbone (flax linen).

The native architecture family behind BirdNET v2.4 / v3.0 / Perch v2 when
real exported weights are not present: mel-spectrogram front-end (MXU
matmuls, :mod:`birda_tpu.ops.melspec`) feeding an MBConv backbone, global
pooling, an embedding head, and a class head. The I/O contracts (sample
rate/segment/classes/embedding dim, SURVEY §2.2) are exact; real ONNX
weights, when installed, run through :mod:`birda_tpu.onnx.lowering` instead.

All matmuls/convs accept a ``dtype`` (bfloat16 on TPU) with fp32 parameters
and fp32 final logits — the standard mixed-precision inference recipe.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.melspec import MelSpecConfig, melspec


class ConvBNAct(nn.Module):
    features: int
    kernel: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    groups: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, self.kernel, self.strides,
            feature_group_count=self.groups, use_bias=False,
            dtype=self.dtype, padding="SAME",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, dtype=self.dtype, axis_name=None
        )(x)
        if self.act:
            x = nn.swish(x)
        return x


class SqueezeExcite(nn.Module):
    features: int
    se_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.se_features, (1, 1), dtype=self.dtype)(s)
        s = nn.swish(s)
        s = nn.Conv(self.features, (1, 1), dtype=self.dtype)(s)
        return x * jax.nn.sigmoid(s)


class MBConv(nn.Module):
    features: int
    expand: int
    kernel: tuple[int, int]
    strides: tuple[int, int]
    se_ratio: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x.shape[-1]
        mid = inp * self.expand
        h = x
        if self.expand != 1:
            h = ConvBNAct(mid, (1, 1), dtype=self.dtype)(h)
        h = ConvBNAct(
            mid, self.kernel, self.strides, groups=mid, dtype=self.dtype
        )(h)
        if self.se_ratio > 0:
            h = SqueezeExcite(
                mid, max(1, int(inp * self.se_ratio)), dtype=self.dtype
            )(h)
        h = ConvBNAct(self.features, (1, 1), act=False, dtype=self.dtype)(h)
        if self.strides == (1, 1) and inp == self.features:
            h = h + x
        return h


class FusedMBConv(nn.Module):
    """EfficientNetV2-style fused block: one full 3x3 expand conv instead of
    1x1-expand + depthwise. At early spatial resolutions this keeps the
    expand-width activations off HBM (the inference step is bandwidth-bound)
    and replaces VPU-bound depthwise convs with MXU matmul-convs."""

    features: int
    expand: int
    kernel: tuple[int, int]
    strides: tuple[int, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x.shape[-1]
        mid = inp * self.expand
        if self.expand != 1:
            h = ConvBNAct(mid, self.kernel, self.strides, dtype=self.dtype)(x)
            h = ConvBNAct(self.features, (1, 1), act=False, dtype=self.dtype)(h)
        else:
            h = ConvBNAct(
                self.features, self.kernel, self.strides,
                act=False, dtype=self.dtype,
            )(x)
        if self.strides == (1, 1) and inp == self.features:
            h = h + x
        return h


#: (features, repeats, kernel, strides, expand, fused) block table —
#: EfficientNetV2-style: fused blocks at high spatial resolution, MBConv+SE
#: once maps are small.
DEFAULT_BLOCKS: Sequence[tuple[int, int, int, int, int, bool]] = (
    (16, 1, 3, 1, 1, True),
    (24, 2, 3, 2, 4, True),
    (40, 2, 3, 2, 4, True),
    (80, 3, 3, 2, 4, False),
    (112, 3, 5, 1, 6, False),
    (192, 4, 5, 2, 6, False),
    (320, 1, 3, 1, 6, False),
)


class AudioClassifier(nn.Module):
    """Waveform -> (class scores, embeddings).

    Input: ``[batch, sample_count]`` float32 at the model's sample rate.
    Output dict: ``scores`` [batch, num_classes] after sigmoid/softmax,
    ``logits`` (pre-activation, fp32), ``embeddings`` [batch, embedding_dim].
    """

    mel: MelSpecConfig
    num_classes: int
    embedding_dim: int
    activation: str = "sigmoid"  # or "softmax"
    blocks: Sequence[tuple[int, int, int, int, int]] = DEFAULT_BLOCKS
    stem_features: int = 32
    head_features: int = 1280
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, waveform):
        # 2-D input: raw waveform [B, sample_count]. 3-D input: precomputed
        # mel [B, frames, mels] (the chunk runner frames directly from the
        # contiguous chunk to avoid materializing windows in HBM).
        if waveform.ndim == 3:
            x = waveform
        else:
            x = melspec(waveform, self.mel)  # [B, frames, mels]
        # Per-sample standardization (the front-end contract most audio
        # classifiers bake into the graph).
        mu = jnp.mean(x, axis=(1, 2), keepdims=True)
        sd = jnp.std(x, axis=(1, 2), keepdims=True) + 1e-6
        x = (x - mu) / sd
        x = x[..., None].astype(self.dtype)  # NHWC, H=frames, W=mels

        x = ConvBNAct(self.stem_features, (3, 3), (2, 2), dtype=self.dtype)(x)
        for spec in self.blocks:
            features, repeats, k, s, expand = spec[:5]
            fused = spec[5] if len(spec) > 5 else False
            for i in range(repeats):
                strides = (s, s) if i == 0 else (1, 1)
                if fused:
                    x = FusedMBConv(
                        features, expand, (k, k), strides, dtype=self.dtype
                    )(x)
                else:
                    x = MBConv(
                        features, expand, (k, k), strides, dtype=self.dtype
                    )(x)
        x = ConvBNAct(self.head_features, (1, 1), dtype=self.dtype)(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool

        emb = nn.Dense(self.embedding_dim, dtype=self.dtype, name="embedding")(x)
        emb = nn.swish(emb)
        logits = nn.Dense(
            self.num_classes, dtype=self.dtype, name="classifier"
        )(emb).astype(jnp.float32)

        if self.activation == "softmax":
            scores = jax.nn.softmax(logits, axis=-1)
        else:
            scores = jax.nn.sigmoid(logits)
        return {
            "scores": scores,
            "logits": logits,
            "embeddings": emb.astype(jnp.float32),
        }
