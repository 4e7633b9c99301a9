"""P3D (Pseudo-3D ResNet-199) video-saliency model family.

One parameterized implementation replaces the reference's 12 copy-pasted
graph-builder functions (reference p3d.py:169-523 BN family;
reference gn/p3d_gn.py:214-539 GN+CBAM family).  The encoder is shared; each
decoder is a module; the variants in models/registry.py wire them together.

Encoder (all variants; reference p3d.py:169-196):
    input  [B, 16, 112, 112, 3]  (NDHWC)
    stem   conv (1,7,7) s(1,2,2) -> 64ch, norm, relu      -> 16 x  56x56
    x_1_0  maxpool (2,1,1)/(2,1,1)                        ->  8 x  56x56 x 64
    pool1  maxpool (2,3,3)/(2,2,2)                        ->  8 x  28x28 x 64
    stage1 3 bottlenecks, planes 64                       ->  8 x  28x28 x 256
    pool2  temporal maxpool /2                            ->  4 x  28x28 x 256
    stage2 8 bottlenecks, planes 128, spatial stride 2    ->  4 x  14x14 x 512
    pool3  temporal maxpool /2                            ->  2 x  14x14 x 512
    stage3 36 bottlenecks, planes 256, spatial stride 2   ->  2 x   7x7  x 1024
    pool4  temporal maxpool /2                            ->  1 x   7x7  x 1024

Every one of the 47 bottlenecks takes the 3D path (the reference's 2D branch
for n_s >= depth_3d is dead code since depth_3d == total blocks == 47, see
SURVEY.md section 2.3; it is intentionally omitted here).  The spatial(1x3x3) /
temporal(3x1x1) sub-structure cycles A,B,C with the global block index
(reference p3d.py:38-42); the GN family additionally applies CBAM to the
residual path of every bottleneck (reference gn/p3d_gn.py:175).
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from sap3d_tpu.ops.attention import NonLocal3D, SelfAttention3D
from sap3d_tpu.ops.cbam import CBAM
from sap3d_tpu.ops.layers import (
    ConvNormRelu,
    Norm,
    TransposeConvNormRelu,
    glorot,
    max_pool3d,
)
from sap3d_tpu.ops.stem_s2d import StemConv

BLOCK_EXPANSION = 4  # reference p3d.py:8


def _conv(features, kernel, strides=1, use_bias=True, dtype=None, name=None):
    """Plain conv3d, SAME padding, Xavier init (no norm/activation)."""
    if isinstance(kernel, int):
        kernel = (kernel,) * 3
    if isinstance(strides, int):
        strides = (strides,) * 3
    return nn.Conv(
        features, kernel_size=tuple(kernel), strides=tuple(strides),
        padding="SAME", use_bias=use_bias, kernel_init=glorot(), dtype=dtype,
        name=name,
    )


def _tconv(features, kernel, strides, use_bias=True, dtype=None, name=None):
    """Plain conv3d_transpose, SAME padding (output = input * stride).

    Deliberately nn.ConvTranspose (input-dilated lowering): the
    phase-decomposed alternative (ops/fast_tconv.py) wins in isolation
    (2.3ms vs 3.4ms for the up_2_0 shape) but LOSES in the full program —
    XLA fuses the dilated conv with the following norm/concat, while the
    phase version's interleave transposes break fusion (measured 115.4 vs
    109.5 ms/step, BASELINE.md round 2).

    SAP3D_HEAD_TCONV_PS=1 routes the 1-channel HEAD tconvs (the x_0_1 /
    predict_revise saliency heads, reference p3d.py:397 etc.) through the
    phase forward — the hypothesis was that with only sigmoid+loss after
    the head there is no fusion to break, and C_out=1 starves the MXU's
    output lanes 127/128 in the dilated form (measured 10%/14% site
    efficiency).  MEASURED AT FULL STEP (v5e r4 part D): REJECTED as a
    default too — 104.66 vs 103.33 ms/step; the phase interleave's
    [B,D,HW,8]->[B,2D,2H,2W,1] relayout costs more than the N=8-vs-N=1
    MXU packing recovers at this site's size.  Same param tree either
    way; the flag remains for future shapes."""
    if isinstance(kernel, int):
        kernel = (kernel,) * 3
    if isinstance(strides, int):
        strides = (strides,) * 3
    if features == 1 and os.environ.get("SAP3D_HEAD_TCONV_PS", "0") == "1":
        from sap3d_tpu.ops.fast_tconv import FastConvTranspose

        return FastConvTranspose(
            features, kernel_size=tuple(kernel), strides=tuple(strides),
            use_bias=use_bias, dtype=dtype, name=name,
        )
    return nn.ConvTranspose(
        features, kernel_size=tuple(kernel), strides=tuple(strides),
        padding="SAME", use_bias=use_bias, kernel_init=glorot(), dtype=dtype,
        name=name,
    )


class Bottleneck(nn.Module):
    """One P3D bottleneck (reference p3d.py:30-136; GN+CBAM gn/p3d_gn.py:74-179).

    1x1x1 reduce (spatial stride on stage entry) -> norm -> relu ->
    ST_{A|B|C} -> 1x1x1 expand x4 -> norm; residual optionally projected by a
    strided 1x1x1 conv + norm (and CBAM'd in the GN family); add -> relu.

    The 1x1x1 convs have no bias (reference builds them with bare
    tf.nn.conv3d, p3d.py:86,112,125); the spatial/temporal S/T convs do
    (reference convS/convT bias_add, p3d.py:18-27).
    """

    planes: int
    st_type: str  # 'A' | 'B' | 'C'
    spatial_stride: int = 1
    project: bool = False
    norm_mode: str = "bn"
    use_cbam: bool = False
    dtype: jnp.dtype | None = None
    axis_name: str | None = None
    # Reference-faithful inference quirk: the reference never forwards its
    # `training` flag into make_block/Bottleneck (reference p3d.py:141,148 —
    # both default training=True and the builders at p3d.py:290-303 omit it),
    # so every BOTTLENECK BatchNorm normalizes with batch statistics even at
    # inference, while the stem/decoder BNs honor the flag.  Enable to
    # reproduce reference saliency maps bit-for-bit from imported TF
    # checkpoints (tests/test_tf_import.py); off by default — running
    # averages at eval are the sane semantics.
    bn_reference_quirk: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if self.bn_reference_quirk and self.norm_mode == "bn":
            train = True  # norm layers only; this module has no dropout
        norm = lambda name: Norm(  # noqa: E731
            self.norm_mode, dtype=self.dtype, axis_name=self.axis_name, name=name
        )
        p = self.planes
        s = self.spatial_stride

        out = _conv(p, 1, (1, s, s), use_bias=False, dtype=self.dtype,
                    name="reduce")(x)
        out = norm("reduce_norm")(out, train)
        out = nn.relu(out)

        conv_s = _conv(p, (1, 3, 3), dtype=self.dtype, name="conv_s")
        conv_t = _conv(p, (3, 1, 1), dtype=self.dtype, name="conv_t")
        if self.st_type == "A":  # S then T, serially (reference p3d.py:56-63)
            out = nn.relu(norm("s_norm")(conv_s(out), train))
            out = nn.relu(norm("t_norm")(conv_t(out), train))
        elif self.st_type == "B":  # S parallel T, summed (reference p3d.py:65-72)
            sp = nn.relu(norm("s_norm")(conv_s(out), train))
            tp = nn.relu(norm("t_norm")(conv_t(out), train))
            out = sp + tp
        elif self.st_type == "C":  # S then S + T(S) (reference p3d.py:74-81)
            sp = nn.relu(norm("s_norm")(conv_s(out), train))
            tp = nn.relu(norm("t_norm")(conv_t(sp), train))
            out = sp + tp
        else:
            raise ValueError(f"bad st_type {self.st_type!r}")

        out = _conv(p * BLOCK_EXPANSION, 1, use_bias=False, dtype=self.dtype,
                    name="expand")(out)
        out = norm("expand_norm")(out, train)

        residual = x
        if self.project:
            residual = _conv(
                p * BLOCK_EXPANSION, 1, (1, s, s), use_bias=False,
                dtype=self.dtype, name="proj",
            )(residual)
            residual = norm("proj_norm")(residual, train)
        if self.use_cbam:
            # GN family: CBAM on the residual path of every bottleneck
            # (reference gn/p3d_gn.py:175).
            residual = CBAM(dtype=self.dtype, name="cbam")(residual)

        return nn.relu(out + residual)


# (planes, num_blocks) per stage: 3+8+36 = 47 bottlenecks = P3D-199
# (reference p3d.py:290-303 with depth_3d=47).
_STAGES = ((64, 3), (128, 8), (256, 36))


class P3DEncoder(nn.Module):
    """Shared 47-bottleneck encoder; returns all skip features.

    Feature dict keys (shapes for a [B,16,112,112,3] input):
      conv1  [B,16,56,56,64]   stem conv+norm+relu
      x_1_0  [B, 8,56,56,64]   temporal pool of conv1 (reference p3d.py:287)
      pool1  [B, 8,28,28,64]   (2,3,3)/(2,2,2) pool (reference p3d.py:288)
      res1   [B, 8,28,28,256]  stage-1 output
      pool2  [B, 4,28,28,256]  a.k.a. x_2_0
      res2   [B, 4,14,14,512]
      pool3  [B, 2,14,14,512]  a.k.a. x_3_0
      res3   [B, 2, 7, 7,1024]
      pool4  [B, 1, 7, 7,1024] a.k.a. x_4_0
    """

    norm_mode: str = "bn"
    use_cbam: bool = False
    dtype: jnp.dtype | None = None
    axis_name: str | None = None
    # Overridable for tiny test/bench models; (planes, num_blocks) per stage.
    stages: tuple = _STAGES
    stem_features: int = 64
    # See Bottleneck.bn_reference_quirk (bottleneck BNs only; the stem BN
    # honors `train` in the reference too, p3d.py:284).
    bn_reference_quirk: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> dict[str, jax.Array]:
        feats: dict[str, jax.Array] = {}
        # Stem: (1,7,7) conv stride (1,2,2), no bias (reference p3d.py:172).
        # StemConv == nn.Conv with an optional space-to-depth formulation
        # (SAP3D_STEM_S2D — C_in=3 starves the MXU lanes; ops/stem_s2d.py).
        h = StemConv(self.stem_features, kernel_hw=7, dtype=self.dtype,
                     name="stem")(x)
        h = Norm(self.norm_mode, dtype=self.dtype, axis_name=self.axis_name,
                 name="stem_norm")(h, train)
        h = nn.relu(h)
        feats["conv1"] = h
        feats["x_1_0"] = max_pool3d(h, (2, 1, 1), (2, 1, 1))
        h = max_pool3d(h, (2, 3, 3), (2, 2, 2))
        feats["pool1"] = h

        n_s = 0  # global bottleneck counter drives A/B/C cycling
        for stage_idx, (planes, num) in enumerate(self.stages):
            for block_idx in range(num):
                first = block_idx == 0
                h = Bottleneck(
                    planes=planes,
                    st_type="ABC"[n_s % 3],
                    # stage entry downsamples spatially except stage 1
                    # (reference make_block: cnt==0 -> stride 1, p3d.py:149-153)
                    spatial_stride=2 if (first and n_s != 0) else 1,
                    project=first,
                    norm_mode=self.norm_mode,
                    use_cbam=self.use_cbam,
                    dtype=self.dtype,
                    axis_name=self.axis_name,
                    bn_reference_quirk=self.bn_reference_quirk,
                    name=f"stage{stage_idx + 1}_block{block_idx}",
                )(h, train)
                n_s += 1
            feats[f"res{stage_idx + 1}"] = h
            h = max_pool3d(h, (2, 1, 1), (2, 1, 1))
            feats[f"pool{stage_idx + 2}"] = h
        return feats


# ---------------------------------------------------------------------------
# Decoders
# ---------------------------------------------------------------------------


def _cat(xs: Sequence[jax.Array], site: str | None = None):
    """Dense-skip channel concat feeding a ConvNormRelu.

    By default (SAP3D_CONCAT_SPLIT, see ops/concat_split.py) the parts are
    handed to ConvNormRelu unconcatenated and the conv runs split-and-summed
    per part — the concat tensor never materializes in HBM (measured +4.9%
    full-step on v5e, r4).  SAP3D_CONCAT_SPLIT=0 restores eager concat
    globally; SAP3D_CONCAT_EAGER_SITES=<name,...> restores it per named
    ``site`` (A/B instrument — param trees identical either way).
    CONTRACT: every _cat consumer must be a ConvNormRelu (the only module
    that accepts a parts tuple).  Sites feeding anything else — the plain
    conv in GNSAConcat2Decoder, UNetDecoder's transpose convs — call
    jnp.concatenate eagerly themselves."""
    from sap3d_tpu.ops.concat_split import (
        concat_split_enabled,
        eager_concat_sites,
    )

    if concat_split_enabled() and site not in eager_concat_sites():
        return tuple(xs)
    return jnp.concatenate(list(xs), axis=-1)


class UNetDecoder(nn.Module):
    """U-Net skip decoder of p3d_unet (reference p3d.py:196-221).

    Note: the reference computes deconv3_concat but feeds deconv3_re (not the
    concat) into the dropout/head (reference p3d.py:213-214); the unused
    concat is omitted here.  Output is sigmoid-activated.
    """

    norm_mode: str = "bn"
    dropout_rate: float = 0.5
    dtype: jnp.dtype | None = None
    axis_name: str | None = None

    @nn.compact
    def __call__(self, feats, train: bool) -> jax.Array:
        kw = dict(norm_mode=self.norm_mode, dtype=self.dtype,
                  axis_name=self.axis_name)
        # eager concats: these feed TransposeConvNormRelu, which (unlike
        # ConvNormRelu) has no split-conv path — see _cat's contract
        d1 = TransposeConvNormRelu(512, (1, 3, 3), 2, **kw, name="deconv1")(
            feats["pool4"], train)
        d2 = TransposeConvNormRelu(256, (2, 3, 3), 2, **kw, name="deconv2")(
            jnp.concatenate([d1, feats["pool3"]], axis=-1), train)
        d3 = TransposeConvNormRelu(128, 3, 2, **kw, name="deconv3")(
            jnp.concatenate([d2, feats["pool2"]], axis=-1), train)
        d3 = nn.Dropout(self.dropout_rate, deterministic=not train)(d3)
        h = _conv(32, 1, dtype=self.dtype, name="head_conv")(d3)
        out = _tconv(1, 3, 2, dtype=self.dtype, name="head_tconv")(h)
        return nn.sigmoid(out)


class ConcatDecoder(nn.Module):
    """Easy-upsampling concat decoder of p3d_concat (reference p3d.py:224-276).

    Output is LINEAR (no sigmoid, reference p3d.py:275-276).
    """

    norm_mode: str = "bn"
    dropout_rate: float = 0.5
    dtype: jnp.dtype | None = None
    axis_name: str | None = None

    @nn.compact
    def __call__(self, feats, train: bool) -> jax.Array:
        kw = dict(norm_mode=self.norm_mode, dtype=self.dtype,
                  axis_name=self.axis_name)
        dp2 = TransposeConvNormRelu(128, 3, 1, **kw, name="deconv_pool2")(
            feats["pool2"], train)
        dp3 = TransposeConvNormRelu(256, 3, 2, **kw, name="deconv_pool3")(
            feats["pool3"], train)
        dp4 = TransposeConvNormRelu(512, 3, 4, **kw, name="deconv_pool4")(
            feats["pool4"], train)
        h = ConvNormRelu(512, 3, 1, **kw, name="conv_concat")(
            _cat([dp2, dp3, dp4]), train)
        h = TransposeConvNormRelu(128, 3, 2, **kw, name="deconv_revise")(h, train)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        return _tconv(1, 3, 2, dtype=self.dtype, name="predict_revise")(h)


class UNetPPDecoder(nn.Module):
    """UNet++ nested decoder family (reference p3d.py:280-523).

    attention: 'sa'   — self-attention at x_4_0 / x_3_1 / x_2_2 (full) and
                        x_1_3 (key/value-subsampled) (p3d_unetplusplus*,
                        reference p3d.py:311-331)
               'nl'   — SA + non-local at the same sites (p3d_unetplusplus_nl,
                        reference p3d.py:492-516; the reference variant is
                        unrunnable as written — missing `training` args, a
                        broken pool3d call, a 1-channel non_local and a
                        stride-12 typo, SURVEY.md section 2.2 — this is the
                        corrected runnable equivalent, with the dead 1-channel
                        x_0_1 non_local omitted)
               'none' — no attention (p3d_unetplusplus_nonsa)
    head: 'full' — tconv->16ch, SA(subsampled), dropout, 1x1x1 conv -> 1ch
                   (p3d_unetplusplus, reference p3d.py:333-337; the reference's
                   sub_size=4 attention there is shape-inconsistent — here the
                   key/value pooling rule makes it well-defined, see
                   ops/attention.py)
          'ds'   — dropout then a single tconv straight to 1ch
                   ("fake downsample", reference p3d.py:391-397)
    Output is sigmoid-activated.
    """

    attention: str = "sa"  # 'sa' | 'nl' | 'none'
    head: str = "ds"  # 'full' | 'ds'
    norm_mode: str = "bn"
    dropout_rate: float = 0.5
    dtype: jnp.dtype | None = None
    axis_name: str | None = None
    # long-clip mode: run the SA sites as a shard_map ring over the mesh's
    # time axis instead of a GSPMD all-gather (ops/ring_attention.py)
    ring_mesh: object | None = None

    @nn.compact
    def __call__(self, feats, train: bool) -> jax.Array:
        kw = dict(norm_mode=self.norm_mode, dtype=self.dtype,
                  axis_name=self.axis_name)

        def sa(x, name, subsample=False, sub_size=2):
            if self.attention == "none":
                return x
            return SelfAttention3D(
                subsample=subsample, sub_size=sub_size, **kw, name=name,
                ring_mesh=self.ring_mesh,
            )(x, train)

        def nl(x, name, sub_sample):
            if self.attention != "nl":
                return x
            return NonLocal3D(
                sub_sample=sub_sample, norm_mode=self.norm_mode,
                dtype=self.dtype, axis_name=self.axis_name, name=name,
            )(x, train)

        x_1_0, x_2_0 = feats["x_1_0"], feats["pool2"]
        x_3_0, x_4_0 = feats["pool3"], feats["pool4"]

        x_4_0 = nl(sa(x_4_0, "x_4_0_sa"), "x_4_0_nl", sub_sample=False)
        up_4_0 = TransposeConvNormRelu(512, (1, 3, 3), 2, **kw, name="upx_4_0")(
            x_4_0, train)
        x_3_1 = ConvNormRelu(512, (2, 3, 3), 1, **kw, name="x_3_1")(
            _cat([x_3_0, up_4_0], site="x_3_1"), train)
        x_3_1 = nl(sa(x_3_1, "x_3_1_sa"), "x_3_1_nl", sub_sample=False)

        up_3_0 = TransposeConvNormRelu(256, (2, 3, 3), 2, **kw, name="upx_3_0")(
            x_3_0, train)
        x_2_1 = ConvNormRelu(256, 3, 1, **kw, name="x_2_1")(
            _cat([x_2_0, up_3_0], site="x_2_1"), train)
        up_3_1 = TransposeConvNormRelu(256, (2, 3, 3), 2, **kw, name="upx_3_1")(
            x_3_1, train)
        x_2_2 = ConvNormRelu(256, 3, 1, **kw, name="x_2_2")(
            _cat([x_2_1, up_3_1], site="x_2_2"), train)
        x_2_2 = nl(sa(x_2_2, "x_2_2_sa"), "x_2_2_nl", sub_sample=False)

        up_2_0 = TransposeConvNormRelu(128, 3, 2, **kw, name="upx_2_0")(
            x_2_0, train)
        x_1_1 = ConvNormRelu(128, 3, 1, **kw, name="x_1_1")(
            _cat([x_1_0, up_2_0], site="x_1_1"), train)
        up_2_1 = TransposeConvNormRelu(128, 3, 2, **kw, name="upx_2_1")(
            x_2_1, train)
        x_1_2 = ConvNormRelu(128, 3, 1, **kw, name="x_1_2")(
            _cat([x_1_1, up_2_1], site="x_1_2"), train)
        up_2_2 = TransposeConvNormRelu(128, 3, 2, **kw, name="upx_2_2")(
            x_2_2, train)
        x_1_3 = ConvNormRelu(128, 3, 1, **kw, name="x_1_3")(
            _cat([x_1_2, up_2_2], site="x_1_3"), train)
        if self.attention == "nl":
            x_1_3 = nl(x_1_3, "x_1_3_nl", sub_sample=True)
        else:
            x_1_3 = sa(x_1_3, "x_1_3_sa", subsample=True)

        if self.head == "full":
            out = _tconv(16, 3, 2, dtype=self.dtype, name="x_0_1")(x_1_3)
            out = sa(out, "x_0_1_sa", subsample=True, sub_size=4)
            out = nn.Dropout(self.dropout_rate, deterministic=not train)(out)
            out = _conv(1, 1, dtype=self.dtype, name="result")(out)
        else:  # 'ds'
            x_1_3 = nn.Dropout(self.dropout_rate, deterministic=not train)(x_1_3)
            from sap3d_tpu.ops.fast_tconv import (
                PhaseHeadTConv,
                phase_head_loss_enabled,
            )

            if train and phase_head_loss_enabled():
                # phase-layout head: [B,8,56,56,8], consumed by
                # loss_fn_saliency against space-to-depth'd targets (same
                # params/name as the interleaved tconv below; the loss is a
                # permutation-invariant sum, so training math is identical
                # — see ops/fast_tconv.py:phase_head_loss_enabled)
                out = PhaseHeadTConv(1, (3, 3, 3), (2, 2, 2),
                                     dtype=self.dtype, name="x_0_1")(x_1_3)
            else:
                out = _tconv(1, 3, 2, dtype=self.dtype, name="x_0_1")(x_1_3)
        return nn.sigmoid(out)


class GNEasyDecoder(nn.Module):
    """GN-family easy-upsampling decoder (reference gn/p3d_gn.py:214-324).

    Covers inference_p3d (pool4 deconv -> 1024ch) and inference_p3d_concat
    (-> 512ch) via ``wide_pool4``.  Optional SA on pool2/3/4 before the
    deconvs covers inference_p3d_sa_concat (reference gn/p3d_gn.py:326-376).
    Output is LINEAR.
    """

    wide_pool4: bool = False  # True => 1024 filters (inference_p3d)
    use_sa: bool = False  # inference_p3d_sa_concat
    norm_mode: str = "gn"
    dropout_rate: float = 0.5
    dtype: jnp.dtype | None = None
    axis_name: str | None = None

    @nn.compact
    def __call__(self, feats, train: bool) -> jax.Array:
        kw = dict(norm_mode=self.norm_mode, dtype=self.dtype,
                  axis_name=self.axis_name)
        pool2, pool3, pool4 = feats["pool2"], feats["pool3"], feats["pool4"]
        if self.use_sa:
            pool2 = SelfAttention3D(**kw, name="pool2_sa")(pool2, train)
            pool3 = SelfAttention3D(**kw, name="pool3_sa")(pool3, train)
            pool4 = SelfAttention3D(**kw, name="pool4_sa")(pool4, train)
        dp3 = TransposeConvNormRelu(512, 3, 2, **kw, name="deconv_pool3")(
            pool3, train)
        dp4 = TransposeConvNormRelu(
            1024 if self.wide_pool4 else 512, 3, 4, **kw, name="deconv_pool4"
        )(pool4, train)
        h = ConvNormRelu(1024, 3, 1, **kw, name="conv_concat")(
            _cat([dp3, dp4, pool2]), train)
        h = TransposeConvNormRelu(256, 3, 2, **kw, name="deconv_revise")(h, train)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        return _tconv(1, 3, 2, dtype=self.dtype, name="predict_revise")(h)


class GNSAConcat2Decoder(nn.Module):
    """inference_p3d_sa_concat_2: SA after the deconvs (reference gn/p3d_gn.py:379-430).

    Output is LINEAR.
    """

    norm_mode: str = "gn"
    dropout_rate: float = 0.5
    dtype: jnp.dtype | None = None
    axis_name: str | None = None

    @nn.compact
    def __call__(self, feats, train: bool) -> jax.Array:
        kw = dict(norm_mode=self.norm_mode, dtype=self.dtype,
                  axis_name=self.axis_name)
        drop = lambda x: nn.Dropout(  # noqa: E731
            self.dropout_rate, deterministic=not train)(x)
        pool2_sa = SelfAttention3D(**kw, name="pool2_sa")(feats["pool2"], train)
        dp3 = TransposeConvNormRelu(256, 3, 2, **kw, name="deconv_pool3")(
            feats["pool3"], train)
        dp3 = SelfAttention3D(**kw, name="deconv_pool3_sa")(dp3, train)
        dp4 = TransposeConvNormRelu(512, 3, 4, **kw, name="deconv_pool4")(
            feats["pool4"], train)
        dp4 = SelfAttention3D(**kw, name="deconv_pool4_sa")(dp4, train)
        # conv -> dropout -> GN+relu ordering per reference gn/p3d_gn.py:423-425.
        h = _conv(512, 3, dtype=self.dtype, name="conv_concat")(
            jnp.concatenate([pool2_sa, dp3, dp4], axis=-1))
        h = drop(h)
        h = nn.relu(Norm(self.norm_mode, dtype=self.dtype,
                         axis_name=self.axis_name, name="conv_concat_gn")(h, train))
        h = TransposeConvNormRelu(128, 3, 2, **kw, name="deconv_revise")(h, train)
        h = drop(h)
        return _tconv(1, 3, 2, dtype=self.dtype, name="predict_revise")(h)


class GNDecoderBlock(nn.Module):
    """Two-stage decoder-block head (reference gn/p3d_gn.py:433-539).

    use_sa=True  => inference_p3d_sa_decoder_block (SA on pool2 and on the
                    pool3/pool4 deconvs; concat skips deconv_pool2)
    use_sa=False => inference_p3d_decoder_block (deconv_pool2/3/4 concat)
    Output is LINEAR (final 3x3x3 conv to 1 channel).
    """

    use_sa: bool = True
    norm_mode: str = "gn"
    dropout_rate: float = 0.5
    dtype: jnp.dtype | None = None
    axis_name: str | None = None

    @nn.compact
    def __call__(self, feats, train: bool) -> jax.Array:
        kw = dict(norm_mode=self.norm_mode, dtype=self.dtype,
                  axis_name=self.axis_name)
        drop = lambda x: nn.Dropout(  # noqa: E731
            self.dropout_rate, deterministic=not train)(x)
        pool2, pool3, pool4 = feats["pool2"], feats["pool3"], feats["pool4"]

        if self.use_sa:
            pool2_sa = SelfAttention3D(**kw, name="pool2_sa")(pool2, train)
            dp3 = TransposeConvNormRelu(512, (2, 3, 3), 2, **kw,
                                        name="deconv_pool3")(pool3, train)
            dp3 = SelfAttention3D(**kw, name="deconv_pool3_sa")(dp3, train)
            dp4 = TransposeConvNormRelu(1024, (1, 3, 3), 4, **kw,
                                        name="deconv_pool4")(pool4, train)
            dp4 = SelfAttention3D(**kw, name="deconv_pool4_sa")(dp4, train)
            cat = _cat([pool2_sa, dp3, dp4])
        else:
            dp2 = TransposeConvNormRelu(128, 3, 1, **kw, name="deconv_pool2")(
                pool2, train)
            dp3 = TransposeConvNormRelu(256, (2, 3, 3), 2, **kw,
                                        name="deconv_pool3")(pool3, train)
            dp4 = TransposeConvNormRelu(512, (1, 3, 3), 4, **kw,
                                        name="deconv_pool4")(pool4, train)
            cat = _cat([dp2, dp3, dp4])

        h = ConvNormRelu(1024, 3, 1, **kw, name="conv_concat")(cat, train)
        h = ConvNormRelu(256, 3, 1, **kw, name="decoder1_conv1")(h, train)
        h = TransposeConvNormRelu(256, 3, 2, **kw, name="decoder1_deconv")(h, train)
        h = ConvNormRelu(128, 3, 1, **kw, name="decoder1_conv2")(h, train)
        if self.use_sa:
            h = drop(h)  # reference gn/p3d_gn.py:476 (sa variant only)
        h = ConvNormRelu(32, 3, 1, **kw, name="decoder2_conv1")(h, train)
        h = TransposeConvNormRelu(32, 3, 2, **kw, name="decoder2_deconv")(h, train)
        h = ConvNormRelu(16, 3, 1, **kw, name="decoder2_conv2")(h, train)
        h = drop(h)
        return _conv(1, 3, dtype=self.dtype, name="results")(h)


_DECODERS = {
    "unet": UNetDecoder,
    "concat": ConcatDecoder,
    "unetpp": UNetPPDecoder,
    "gn_easy": GNEasyDecoder,
    "gn_sa_concat_2": GNSAConcat2Decoder,
    "gn_decoder_block": GNDecoderBlock,
}


class P3DSaliency(nn.Module):
    """Full model: shared P3D encoder + one of the decoder heads.

    Input  [B, T, H, W, 3], output [B, T, H, W, 1] saliency (sigmoid or
    linear depending on the decoder — matching each reference variant).
    """

    decoder: str = "unetpp"
    decoder_kwargs: dict = None  # type: ignore[assignment]
    norm_mode: str = "bn"
    backbone_cbam: bool = False
    dropout_rate: float = 0.5
    dtype: jnp.dtype | None = None
    axis_name: str | None = None
    # Overridable for tiny test/bench models.
    stages: tuple = _STAGES
    stem_features: int = 64
    # Reference-faithful inference: bottleneck BNs normalize with batch
    # statistics even at eval (see Bottleneck.bn_reference_quirk).  Apply
    # with mutable=["batch_stats"] (and discard) when enabling at eval.
    bn_reference_quirk: bool = False
    # Long-clip sequence parallelism: a time mesh (core/mesh.make_time_mesh)
    # turns the decoder's SA sites into shard_map rings (SA decoders only).
    ring_mesh: object | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        feats = P3DEncoder(
            norm_mode=self.norm_mode, use_cbam=self.backbone_cbam,
            dtype=self.dtype, axis_name=self.axis_name, name="encoder",
            stages=self.stages, stem_features=self.stem_features,
            bn_reference_quirk=self.bn_reference_quirk,
        )(x, train)
        dec_cls = _DECODERS[self.decoder]
        extra = {}
        # Only the SA-capable decoder declares a ring_mesh field; for the
        # rest, long-clip time sharding falls back to the GSPMD gather path
        # (which tests/test_time_parallel.py proves correct) instead of
        # crashing on an unknown kwarg.
        if (self.ring_mesh is not None
                and "ring_mesh" in dec_cls.__dataclass_fields__):
            extra["ring_mesh"] = self.ring_mesh
        out = dec_cls(
            **(self.decoder_kwargs or {}),
            **extra,
            norm_mode=self.norm_mode,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            axis_name=self.axis_name,
            name="decoder",
        )(feats, train)
        return out.astype(jnp.float32)
