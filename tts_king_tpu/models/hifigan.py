"""HiFi-GAN vocoder, TPU-native.

Generator parity with the reference (hifi/models.py:146-201): conv_pre(k=7) ->
4x [leaky_relu(0.1) -> transposed-conv upsample -> mean of 3 MRF ResBlock1
stacks] -> leaky_relu (torch default slope 0.01 at models.py:197 — preserved)
-> conv_post(k=7) -> tanh. Total upsampling 8*8*2*2 = 256 = hop length.

Weight normalization is a *parametrization*, so inference models fold it at
checkpoint-conversion time (g * v / ||v||, torch dim=0 semantics) and run
plain convs; for GAN training the modules can keep (g, v) pairs
(`weight_norm=True`), matching torch's optimization geometry.

Discriminators (MPD periods 2/3/5/7/11 and MSD with avg-pool pyramid) and the
GAN losses (hifi/models.py:213-407) are included, enabling the vocoder
training the reference left unimplemented (hifiapi.py:32-33).

Layout is (B, T, C): time on the sublane axis, channels on the lane axis, so
every conv lowers onto the MXU.
"""

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tts_king_tpu.config import VocoderModelConfig
from tts_king_tpu.ops.convs import conv1d, conv_transpose1d

LRELU_SLOPE = 0.1


def _normal_init(std=0.01):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)
    return init


class TorchConv1d(nn.Module):
    """Conv1d with torch semantics and optional weight-norm parametrization."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    weight_norm: bool = False
    init_std: float = 0.01
    dtype: Any = jnp.float32
    # >1: the input arrives space-to-depth packed by this factor; run the
    # conv on the packed layout (full-width MXU contractions for narrow
    # channels — ops/convs.pack_kernel_1d). Requires stride=1, groups=1,
    # same padding.
    packed: int = 1

    @nn.compact
    def __call__(self, x, return_params=False):
        in_ch = x.shape[-1] // self.packed
        shape = (self.kernel_size, in_ch // self.groups, self.features)
        if self.weight_norm:
            v = self.param("v", _normal_init(self.init_std), shape)
            g = self.param("g", nn.initializers.ones, (self.features,))
            # torch weight_norm dim=0 on (out, in, k): per-out-channel norm.
            norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True) + 1e-12)
            kernel = g[None, None, :] * v / norm
        else:
            kernel = self.param("kernel", _normal_init(self.init_std), shape)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if return_params:
            # fused-kernel path: declare the identical param tree but hand
            # the (folded) kernel/bias to the caller instead of computing.
            return kernel, bias
        if self.packed > 1:
            from tts_king_tpu.ops.convs import packed_conv1d

            assert self.stride == 1 and self.groups == 1
            return packed_conv1d(x.astype(self.dtype),
                                 kernel.astype(self.dtype),
                                 bias.astype(self.dtype),
                                 dilation=self.dilation, r=self.packed)
        return conv1d(x.astype(self.dtype), kernel.astype(self.dtype),
                      bias.astype(self.dtype), self.stride, self.padding,
                      self.dilation, self.groups)


class TorchConvTranspose1d(nn.Module):
    """ConvTranspose1d with torch semantics; kernel stored as (k, Cin, Cout)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    weight_norm: bool = False
    init_std: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        shape = (self.kernel_size, in_ch, self.features)
        if self.weight_norm:
            v = self.param("v", _normal_init(self.init_std), shape)
            # torch weight_norm dim=0 on (in, out, k): per-*input*-channel norm.
            g = self.param("g", nn.initializers.ones, (in_ch,))
            norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 2), keepdims=True) + 1e-12)
            kernel = g[None, :, None] * v / norm
        else:
            kernel = self.param("kernel", _normal_init(self.init_std), shape)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return conv_transpose1d(x.astype(self.dtype), kernel.astype(self.dtype),
                                bias.astype(self.dtype), self.stride,
                                self.padding)


def get_padding(kernel_size, dilation=1):
    """Same-padding helper (hifi/vocoder/utils.py:33-36)."""
    return (kernel_size * dilation - dilation) // 2


class ResBlock1(nn.Module):
    """MRF residual stack: 3x [lrelu->dilated conv->lrelu->conv(d=1)] + skip
    (hifi/models.py:12-101)."""

    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, int, int] = (1, 3, 5)
    weight_norm: bool = False
    dtype: Any = jnp.float32
    packed: int = 1  # input space-to-depth packed by this factor

    @nn.compact
    def __call__(self, x, collect=False):
        if collect:
            # declare the same param tree, return {convs1_i/convs2_i ->
            # {kernel, bias}} for the fused Pallas stage instead of running
            out = {}
            for i, d in enumerate(self.dilation):
                for group, dd in (("convs1", d), ("convs2", 1)):
                    k, b = TorchConv1d(
                        self.channels, self.kernel_size,
                        padding=get_padding(self.kernel_size, dd),
                        dilation=dd, weight_norm=self.weight_norm,
                        dtype=self.dtype, packed=self.packed,
                        name=f"{group}_{i}")(x, return_params=True)
                    out[f"{group}_{i}"] = {"kernel": k, "bias": b}
            return out
        for i, d in enumerate(self.dilation):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = TorchConv1d(self.channels, self.kernel_size,
                             padding=get_padding(self.kernel_size, d),
                             dilation=d, weight_norm=self.weight_norm,
                             dtype=self.dtype, packed=self.packed,
                             name=f"convs1_{i}")(xt)
            xt = nn.leaky_relu(xt, LRELU_SLOPE)
            xt = TorchConv1d(self.channels, self.kernel_size,
                             padding=get_padding(self.kernel_size, 1),
                             weight_norm=self.weight_norm,
                             dtype=self.dtype, packed=self.packed,
                             name=f"convs2_{i}")(xt)
            x = xt + x
        return x


class ResBlock2(nn.Module):
    """Lighter variant: 2x [lrelu->dilated conv] + skip (hifi/models.py:104-143)."""

    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, int] = (1, 3)
    weight_norm: bool = False
    dtype: Any = jnp.float32
    packed: int = 1

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilation):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = TorchConv1d(self.channels, self.kernel_size,
                             padding=get_padding(self.kernel_size, d),
                             dilation=d, weight_norm=self.weight_norm,
                             dtype=self.dtype, packed=self.packed,
                             name=f"convs_{i}")(xt)
            x = xt + x
        return x


class Generator(nn.Module):
    """Mel (B, T, 80) -> waveform (B, T*256) in [-1, 1]."""

    config: VocoderModelConfig
    weight_norm: bool = False
    dtype: Any = jnp.float32
    # Space-to-depth-pack narrow-channel MRF stages so their convs contract
    # over >=128 channels on the MXU (4-5x faster late stages; numerics
    # identical — verified against the unpacked path and the torch oracle).
    pack_small_channels: bool = True
    # "xla" | "fused" | "fused_int8": MRF stage backend for stages whose
    # packed width r*ch <= 128. "fused" runs the whole 18-conv stage in one
    # Pallas kernel (VMEM-resident, exact vs the packed XLA path at f32);
    # "fused_int8" additionally quantizes weights per-channel and
    # activations per-conv in-kernel (ops/pallas/mrf_packed.py). Inference
    # only (no custom VJP); training keeps "xla".
    mrf_backend: str = "xla"

    @nn.compact
    def __call__(self, mel):
        h = self.config
        num_kernels = len(h.resblock_kernel_sizes)
        resblock_cls = ResBlock1 if h.resblock == "1" else ResBlock2

        x = TorchConv1d(h.upsample_initial_channel, 7, padding=3,
                        weight_norm=self.weight_norm, dtype=self.dtype,
                        name="conv_pre")(mel.astype(self.dtype))
        for i, (u, k) in enumerate(zip(h.upsample_rates, h.upsample_kernel_sizes)):
            x = nn.leaky_relu(x, LRELU_SLOPE)
            ch = h.upsample_initial_channel // (2 ** (i + 1))
            x = TorchConvTranspose1d(ch, k, stride=u, padding=(k - u) // 2,
                                     weight_norm=self.weight_norm,
                                     dtype=self.dtype, name=f"ups_{i}")(x)
            B, T = x.shape[0], x.shape[1]
            r = 1
            if self.pack_small_channels:
                r = max(1, min(128 // ch, 8))
                while r > 1 and T % r:
                    r //= 2
            if r > 1:
                x = x.reshape(B, T // r, r * ch)
            dil0 = tuple(h.resblock_dilation_sizes[0])
            use_fused = (
                self.mrf_backend != "xla" and h.resblock == "1"
                and r * ch <= 128     # stage weights must fit VMEM
                and all(tuple(rd) == dil0
                        for rd in h.resblock_dilation_sizes))
            if use_fused:
                import jax as _jax

                from tts_king_tpu.ops.pallas.mrf_packed import \
                    mrf_stage_apply

                branch_params = [
                    resblock_cls(ch, rk, tuple(rd),
                                 weight_norm=self.weight_norm,
                                 dtype=self.dtype, packed=r,
                                 name=f"resblocks_{i * num_kernels + j}")(
                                     x, collect=True)
                    for j, (rk, rd) in enumerate(zip(
                        h.resblock_kernel_sizes, h.resblock_dilation_sizes))]
                x = mrf_stage_apply(
                    x, branch_params, tuple(h.resblock_kernel_sizes), dil0,
                    r, mode="int8" if self.mrf_backend == "fused_int8"
                    else "bf16",
                    interpret=_jax.default_backend() == "cpu")
            else:
                acc = None
                for j, (rk, rd) in enumerate(zip(h.resblock_kernel_sizes,
                                                 h.resblock_dilation_sizes)):
                    out = resblock_cls(ch, rk, tuple(rd),
                                       weight_norm=self.weight_norm,
                                       dtype=self.dtype, packed=r,
                                       name=f"resblocks_{i * num_kernels + j}")(x)
                    acc = out if acc is None else acc + out
                x = acc / num_kernels
            if r > 1:
                x = x.reshape(B, T, ch)
        # torch default leaky_relu slope 0.01 here (hifi/models.py:197).
        x = nn.leaky_relu(x, 0.01)
        x = TorchConv1d(1, 7, padding=3, weight_norm=self.weight_norm,
                        dtype=self.dtype, name="conv_post")(x)
        return jnp.tanh(x.astype(jnp.float32))[..., 0]


class WNConv(nn.Module):
    """flax conv (1D or 2D by kernel tuple) with torch weight_norm(dim=0)
    parametrization — the discriminators train with the same optimization
    geometry as the torch originals (hifi/models.py:219-220).

    ``dtype`` is the COMPUTE dtype: params (v, g) and the weight-norm fold
    stay f32 (master weights + stable norm), the conv itself runs in
    ``dtype`` — bf16 doubles MXU throughput on the discriminator stacks."""

    features: int
    kernel_size: Tuple[int, ...]
    strides: Tuple[int, ...] = None
    padding: Any = 0
    feature_group_count: int = 1
    dtype: Any = jnp.float32
    groups_lowering: str = "native"  # see _disc_conv

    @nn.compact
    def __call__(self, x):
        kshape = tuple(self.kernel_size) + (
            x.shape[-1] // self.feature_group_count, self.features)
        v = self.param("v", nn.initializers.lecun_normal(), kshape)
        g = self.param("g", nn.initializers.ones, (self.features,))
        axes = tuple(range(v.ndim - 1))
        norm = jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True) + 1e-12)
        kernel = g * v / norm
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return _disc_conv(x, kernel, bias, self.kernel_size, self.strides,
                          self.padding, self.feature_group_count, self.dtype,
                          self.groups_lowering)


def _block_diag_kernel(kernel, groups, target_groups=1):
    """(K, Cin/G, Cout) grouped kernel -> block-diag kernel for a conv with
    target_groups groups (divides groups; 1 = fully dense): each target
    group packs pack = groups/target_groups original groups as a
    block-diagonal tile, built by a broadcast-multiply with eye(pack) that
    XLA fuses (no scatter). The off-block weights are exact zeros, so the
    partially-densified conv computes the same function as the grouped
    one; outputs differ only by the wider reduction's summation order
    (float rounding, ~1e-7 relative —
    test_msd_blockdiag_lowering_matches_native)."""
    k, cig, cout = kernel.shape
    pack = groups // target_groups
    if pack == 1:
        return kernel
    cog = cout // groups
    wr = kernel.reshape(k, cig, target_groups, pack, cog)
    eye = jnp.eye(pack, dtype=kernel.dtype)
    dense = jnp.einsum("kctpo,qp->ktqcpo", wr, eye)
    dense = dense.reshape(k, target_groups, pack * cig, pack * cog)
    return dense.transpose(0, 2, 1, 3).reshape(k, pack * cig, cout)


def _disc_conv(x, kernel, bias, kernel_size, strides, padding, groups,
               dtype, groups_lowering="native"):
    """groups_lowering="blockdiag_g<T>" lowers a grouped conv as a conv
    with T groups, the kernel expanded into per-group block-diagonal form
    ("blockdiag" = fully dense, T=1). The native per-group contraction
    (Cin/G = 16..64) and output block (Cout/G) are far below the 128-lane
    MXU tile, so XLA's grouped path wastes most of the systolic array; the
    (partially) densified form costs (G/T)x more nominal FLOPs but fills
    the MXU — measured 2-8x faster fwd+bwd on the MSD's mid layers, with
    the optimum at a ~128-wide contraction, i.e. T ~= Cin/128
    (results/groupconv_lowering.jsonl). Same function either way, up to
    reduction-order rounding."""
    if groups_lowering.startswith("blockdiag") and groups > 1:
        import math

        want = (int(groups_lowering.split("_g")[1])
                if "_g" in groups_lowering else 1)
        tg = math.gcd(want, groups)  # width-reduced test configs shrink g
        kernel = _block_diag_kernel(kernel, groups, tg)
        groups = tg
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape,
        ("NHC", "HIO", "NHC") if len(kernel_size) == 1
        else ("NHWC", "HWIO", "NHWC"))
    pad = padding
    if isinstance(pad, int):
        pad = [(pad, pad)] * len(kernel_size)
    out = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype),
        strides or (1,) * len(kernel_size), pad,
        dimension_numbers=dn, feature_group_count=groups)
    return out + bias.astype(dtype)


class SNConv(nn.Module):
    """flax conv (1D or 2D by kernel tuple) with torch spectral_norm(dim=0)
    parametrization (n_power_iterations=1, eps=1e-12).

    The reference builds its first (full-resolution) MSD scale with spectral
    norm (hifi/models.py:317 ``norm_f = ... spectral_norm``, :349
    ``DiscriminatorS(use_spectral_norm=True)``) — a Lipschitz-style stability
    mechanism on the one discriminator that sees raw 22 kHz samples.

    torch semantics reproduced exactly:
      * weight matrix = weight.reshape(out, -1) (dim=0 first);
      * power-iteration buffers u (out,) and v (fan_in,) live in the
        ``spectral`` variable collection (buffers, not optimizer params);
      * training forward (``update=True``, collection mutable) runs ONE
        iteration v <- normalize(W^T u), u <- normalize(W v) under
        stop_gradient, then sigma = u^T W v (differentiable in W);
      * eval forward uses the stored u, v unchanged.
    """

    features: int
    kernel_size: Tuple[int, ...]
    strides: Tuple[int, ...] = None
    padding: Any = 0
    feature_group_count: int = 1
    dtype: Any = jnp.float32  # compute dtype; params + power iteration f32
    groups_lowering: str = "native"  # see _disc_conv

    @nn.compact
    def __call__(self, x, update: bool = False):
        kshape = tuple(self.kernel_size) + (
            x.shape[-1] // self.feature_group_count, self.features)
        w = self.param("weight_orig", nn.initializers.lecun_normal(), kshape)
        # torch layout (out, in, *k) flattened row-major -> from flax
        # (*k, in, out): move out first, keep (in, *k) order for the rest.
        perm = (w.ndim - 1,) + tuple(range(w.ndim - 2, -1, -1))
        mat = w.transpose(perm).reshape(self.features, -1)
        fan_in = mat.shape[1]

        def unit(key, shape, dtype=jnp.float32):
            n = jax.random.normal(key, shape, dtype)
            return n / jnp.linalg.norm(n)

        u_var = self.variable("spectral", "u", unit,
                              self.make_rng("params") if
                              self.is_initializing() else None,
                              (self.features,))
        v_var = self.variable("spectral", "v", unit,
                              self.make_rng("params") if
                              self.is_initializing() else None, (fan_in,))
        u, v = u_var.value, v_var.value
        if update and not self.is_initializing():
            eps = 1e-12
            m = jax.lax.stop_gradient(mat)
            v = m.T @ u
            v = v / jnp.maximum(jnp.linalg.norm(v), eps)
            u = m @ v
            u = u / jnp.maximum(jnp.linalg.norm(u), eps)
            u_var.value, v_var.value = u, v
        sigma = u @ (mat @ v)
        kernel = w / sigma
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return _disc_conv(x, kernel, bias, self.kernel_size, self.strides,
                          self.padding, self.feature_group_count, self.dtype,
                          self.groups_lowering)


class DiscriminatorP(nn.Module):
    """Period discriminator (hifi/models.py:213-282)."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    channels: Tuple[int, ...] = (32, 128, 512, 1024, 1024)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, T) waveform.
        B, T = x.shape
        if T % self.period:
            n_pad = self.period - (T % self.period)
            x = jnp.pad(x, [(0, 0), (0, n_pad)], mode="reflect")
            T = T + n_pad
        x = x.reshape(B, T // self.period, self.period, 1)  # (B, T/p, p, 1)

        fmap = []
        for i, ch in enumerate(self.channels[:-1]):
            x = WNConv(ch, (self.kernel_size, 1), strides=(self.stride, 1),
                       padding=[(2, 2), (0, 0)], dtype=self.dtype,
                       name=f"convs_{i}")(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = WNConv(self.channels[-1], (self.kernel_size, 1),
                   padding=[(2, 2), (0, 0)], dtype=self.dtype,
                   name=f"convs_{len(self.channels) - 1}")(x)
        x = nn.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
        x = WNConv(1, (3, 1), padding=[(1, 1), (0, 0)], dtype=self.dtype,
                   name="conv_post")(x)
        fmap.append(x)
        return x.reshape(B, -1).astype(jnp.float32), fmap


class DiscriminatorS(nn.Module):
    """Scale discriminator (hifi/models.py:313-340). The first MSD scale is
    built with spectral norm on every conv, the pooled scales with weight
    norm (hifi/models.py:317,349)."""

    width: int = 1  # divides every channel count (for small test configs)
    use_spectral_norm: bool = False
    dtype: Any = jnp.float32
    # "auto": block-diag (partially-)dense lowering on the grouped layers
    # where it measured faster (results/groupconv_lowering.jsonl), packed
    # so each conv group contracts ~128 lanes (target groups ~= Cin/128):
    # convs_1/convs_2 fully dense, convs_3 2 groups, convs_4 4 groups.
    # convs_5 (1024->1024 k41 g16, T=128) stays native: its dense-expanded
    # kernel/wgrad dwarfs the tiny spatial extent.
    # "native": XLA grouped convs everywhere. Same function either way
    # (outputs differ only by reduction-order rounding).
    grouped_lowering: str = "auto"

    @nn.compact
    def __call__(self, x, update_sn: bool = False):
        # x: (B, T) waveform -> (B, T, 1).
        h = x[:, :, None]
        w = self.width
        specs = [
            (128 // w, 15, 1, 1, 7), (128 // w, 41, 2, 4, 20),
            (256 // w, 41, 2, 16, 20), (512 // w, 41, 4, 16, 20),
            (1024 // w, 41, 4, 16, 20), (1024 // w, 41, 1, 16, 20),
            (1024 // w, 5, 1, 1, 2),
        ]
        # measured-optimal lowering per layer index (see class docstring)
        auto_lowering = {1: "blockdiag_g1", 2: "blockdiag_g1",
                         3: "blockdiag_g2", 4: "blockdiag_g4"} \
            if self.grouped_lowering == "auto" else {}

        def norm_f(ch, k, s, g, p, name, lowering="native"):
            kw = dict(strides=(s,) if s else None, padding=p,
                      feature_group_count=g, dtype=self.dtype,
                      groups_lowering=lowering, name=name)
            if self.use_spectral_norm:
                return lambda t: SNConv(ch, (k,), **kw)(t, update=update_sn)
            return WNConv(ch, (k,), **kw)

        fmap = []
        for i, (ch, k, s, g, p) in enumerate(specs):
            # group count must divide both in and out channels (relevant only
            # for width-reduced test configs; w=1 keeps the reference groups).
            import math

            g = math.gcd(g, math.gcd(int(h.shape[-1]), ch))
            lowering = auto_lowering.get(i, "native")
            h = norm_f(ch, k, s, g, [(p, p)], f"convs_{i}", lowering)(h)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            fmap.append(h)
        h = norm_f(1, 3, 0, 1, [(1, 1)], "conv_post")(h)
        fmap.append(h)
        return h.reshape(h.shape[0], -1).astype(jnp.float32), fmap


class MultiPeriodDiscriminator(nn.Module):
    """pair_batched=True runs d(concat([y, y_hat])) instead of d(y), d(y_hat)
    per period — bit-exact (convs are linear in batch) and ~half the kernel
    launches; the trainer uses it (results/msd_probe.jsonl)."""

    periods: Sequence[int] = (2, 3, 5, 7, 11)
    channels: Tuple[int, ...] = (32, 128, 512, 1024, 1024)
    dtype: Any = jnp.float32
    pair_batched: bool = False

    @nn.compact
    def __call__(self, y, y_hat):
        rs, gs, fr, fg = [], [], [], []
        B = y.shape[0]
        for p in self.periods:
            d = DiscriminatorP(p, channels=self.channels, dtype=self.dtype,
                               name=f"disc_p{p}")
            if self.pair_batched:
                o, fmaps = d(jnp.concatenate([y, y_hat], 0))
                r, g = o[:B], o[B:]
                fmap_r = [f[:B] for f in fmaps]
                fmap_g = [f[B:] for f in fmaps]
            else:
                r, fmap_r = d(y)
                g, fmap_g = d(y_hat)
            rs.append(r); fr.append(fmap_r); gs.append(g); fg.append(fmap_g)
        return rs, gs, fr, fg


class MultiScaleDiscriminator(nn.Module):
    """Scale 1 spectral-normed, scales 2-3 weight-normed with avg-pool
    pyramid (hifi/models.py:343-374).

    pair_batched=True runs each scale once on concat([y, y_hat]) — bit-exact
    for the weight-normed scales; for the spectral-normed scale it performs
    ONE power iteration per train step over the joint batch instead of
    torch's one-per-forward-call (two per step). Same stationary point, and
    it removes the y->y_hat sequential dependency that serializes the two
    conv stacks: measured 45% faster D-side on TPU (results/msd_probe.jsonl,
    scale-0 bf16 44.3 -> 19.6 ms). Default False = exact torch call
    semantics (the parity-test contract)."""

    n_scales: int = 3
    width: int = 1
    dtype: Any = jnp.float32
    pair_batched: bool = False

    @nn.compact
    def __call__(self, y, y_hat, update_sn: bool = False):
        rs, gs, fr, fg = [], [], [], []
        B = y.shape[0]
        for i in range(self.n_scales):
            if i:
                y = _avg_pool1d(y, 4, 2, 2)
                y_hat = _avg_pool1d(y_hat, 4, 2, 2)
            d = DiscriminatorS(width=self.width, use_spectral_norm=(i == 0),
                               dtype=self.dtype, name=f"disc_s{i}")
            if self.pair_batched:
                o, fmaps = d(jnp.concatenate([y, y_hat], 0),
                             update_sn=update_sn)
                r, g = o[:B], o[B:]
                fmap_r = [f[:B] for f in fmaps]
                fmap_g = [f[B:] for f in fmaps]
            else:
                # torch power-iterates once per forward CALL: d(y) then
                # d(y_hat) both update the buffers sequentially.
                r, fmap_r = d(y, update_sn=update_sn)
                g, fmap_g = d(y_hat, update_sn=update_sn)
            rs.append(r); fr.append(fmap_r); gs.append(g); fg.append(fmap_g)
        return rs, gs, fr, fg


def _avg_pool1d(x, kernel, stride, padding):
    """torch AvgPool1d(count_include_pad=True) over (B, T).

    reduce_window, not gather: reduce_window's backward is a pad+conv while
    the gather formulation's is a scatter-add. Measured equal on the GAN
    step at these pool sizes (results/gan_step_profile.jsonl baseline_f32
    vs poolfix_f32, pool_pyramid_fwdbwd < 0.1 ms in results/msd_probe.jsonl)
    — reduce_window kept as the canonically safe lowering."""
    xp = jnp.pad(x, [(0, 0), (padding, padding)])
    n = 1 + (xp.shape[1] - kernel) // stride
    summed = jax.lax.reduce_window(
        xp, 0.0, jax.lax.add, window_dimensions=(1, kernel),
        window_strides=(1, stride), padding="VALID")
    return summed[:, :n] / kernel


def feature_loss(fmap_r, fmap_g):
    """L1 feature-matching loss x2 (hifi/models.py:377-383). Accumulated in
    f32 regardless of the discriminators' compute dtype."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss += jnp.mean(jnp.abs(rl.astype(jnp.float32)
                                     - gl.astype(jnp.float32)))
    return loss * 2.0


def discriminator_loss(disc_real, disc_gen):
    """LSGAN discriminator loss (hifi/models.py:386-397)."""
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real, disc_gen):
        r = jnp.mean((1.0 - dr) ** 2)
        g = jnp.mean(dg ** 2)
        loss += r + g
        r_losses.append(r)
        g_losses.append(g)
    return loss, r_losses, g_losses


def generator_loss(disc_outputs):
    """LSGAN generator loss (hifi/models.py:400-407)."""
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean((1.0 - dg) ** 2)
        gen_losses.append(l)
        loss += l
    return loss, gen_losses
