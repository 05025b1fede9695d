"""WavJEPA: Joint-Embedding Predictive Architecture over raw waveforms.

TPU-native re-design of the reference JEPA LightningModule
(/root/reference/wavjepa/jepa.py:24-467). Functional capabilities match —
conv frontend → LayerNorm → 512→768 mapper → fixed 1-D sin-cos positions →
12-layer post-norm ViT context encoder → 768→384 → 12-layer predictor over a
mask-token-filled sequence repeated per target group → 384→768 → MSE against
instance-normed top-k-layer-averaged EMA-teacher targets — but the dataflow
is re-shaped for XLA:

  * **No dynamic shapes.** The reference gathers the variable-length visible
    token set (``contextual_features[~ctx_masks]``, jepa.py:399) and scatters
    it back into the mask-token canvas (jepa.py:427). Gather-then-scatter to
    the *same* positions is an identity on visible positions, so here the
    decoder input is a single ``where``: masked → mask_token, visible →
    enc→dec projection of the encoder output. Bit-equivalent, zero dynamic
    shapes, and XLA fuses the select into the surrounding matmuls.
  * **Masked attention instead of shrunken sequences.** The context encoder
    always runs on all `total_patches` tokens with an additive key-padding
    bias; masked positions never contribute as keys, and their (unused)
    query outputs are overwritten by the decoder `where`.
  * **Teacher = params, not a module copy.** The EMA teacher is the same
    encoder applied with a second parameter tree; the update is a pure
    `tree_map` in f32 inside the train step (see train/step.py).
  * bf16 activations on the MXU, f32 norms/softmax/loss.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from wavjepa_tpu.ops.conv_frontend import (
    ConvChannelFeatureExtractor,
    ConvFeatureExtractor,
    ConvSpec,
    WAVJEPA_CONV_SPEC,
    conv_output_length,
)
from wavjepa_tpu.ops.pos_embed import (
    get_1d_sincos_pos_embed_from_grid,
    get_binaural_pos_embed,
)
from wavjepa_tpu.ops.transformer import (
    LayerNorm32,
    TransformerEncoder,
    resolve_attn_impl,
)


def trunc_normal_init(std: float = 0.02):
    """Truncated-normal (±2σ) init used for all Linear weights and the mask
    token in the reference (functions.py trunc_normal_, jepa.py:150-161)."""

    def init(key, shape, dtype):
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32)

    return lambda key, shape, dtype: init(key, shape, dtype).astype(dtype)


@dataclasses.dataclass(frozen=True)
class JEPAConfig:
    """Static model configuration (mirrors the reference's Hydra groups
    extractor/trainer + TransformerLayerCFG defaults, wavjepa_configs.py:28-63)."""

    # frontend
    conv_spec: ConvSpec = WAVJEPA_CONV_SPEC
    in_channels: int = 1
    extractor: str = "conv"  # "conv" | "conv_channel"
    extractor_mode: str = "default"  # "default" | "layer_norm"
    conv_bias: bool = False
    share_weights_over_channels: bool = False
    # encoder / decoder (TransformerLayerCFG.create defaults)
    encoder_layers: int = 12
    encoder_dim: int = 768
    encoder_heads: int = 12
    decoder_layers: int = 12
    decoder_dim: int = 384
    decoder_heads: int = 12
    mlp_ratio: float = 4.0
    layer_norm_eps: float = 1e-6
    size: str = "base"  # "large" rewrites encoder to 24L/1024d/16h
    # (jepa.py:114-118); "tiny" (beyond reference) rewrites encoder+decoder
    # to a seconds-per-step CPU model for smoke runs and loop-level tests
    # input contract
    sample_rate: int = 16000
    process_seconds: float = 2.01
    # teacher
    average_top_k_layers: int = 8
    # positions: "time" (1-D sincos over all tokens) | "binaural"
    pos_embed: str = "time"
    # --- visible-token packing (training-only, None = off) ---
    # The reference runs encoder AND decoder on all `total_patches` tokens
    # with key-padding masks, but under the AudioSet time-inverse masker the
    # encoder only ever *uses* ~39 visible context tokens (max 87 over 82k
    # samples) and each decoder group ~85 (bounded above by
    # pack_encoder + max target coverage). Packing visible tokens into a
    # static P-slot buffer is exact (same keys, same per-token math; unused
    # rows dropped) and attacks the measured v5e wall: batched per-(b,h)
    # attention costs ~(#N-tiles × M rows) MXU cycles, so halving T more
    # than halves attention time, and all linear FLOPs scale with P/T.
    # pack_encoder must be canonicalized-enforced by the caller
    # (train/step.py flips excess visible ctx tokens to masked — p<1e-12 at
    # the AudioSet config); pack_decoder must be >= pack_encoder + the
    # masker's max target coverage so it is always exact.
    pack_encoder: Optional[int] = None
    pack_decoder: Optional[int] = None
    # per-stack remat overrides (None → follow `remat`). With packing the
    # encoder's residuals shrink ~(96/200)², so remat_encoder=False trades
    # ~1 GB of saved residuals for skipping the encoder backward replay.
    remat_encoder: Optional[bool] = None
    remat_decoder: Optional[bool] = None
    # conv-frontend remat override: disabling stores every conv block output
    # (~3.3 GB at the bench batch) but skips the ~45 ms backward replay of
    # the whole frontend
    remat_conv: Optional[bool] = None
    # keep attention probabilities as remat residuals (ops/transformer.py
    # TransformerEncoder.remat_save_probs) — skips the logits+softmax
    # backward replay for ~5.5 GB extra HBM at the packed bench config
    remat_save_probs: bool = False
    # precision
    dtype: Any = jnp.float32
    # remat defaults ON: without it the train step stores every layer's
    # attention logits/activations as backward residuals — measured 56 GB for
    # the base config at batch 256, vs 16 GB HBM on v5e. Recompute-in-backward
    # trades ~30% extra forward FLOPs for fitting the reference batch size.
    remat: bool = True
    # "auto" | "einsum" | "pallas" | "fused_block" — see ops/transformer.py
    attn_impl: str = "auto"
    # decoder-stack override (None → follow attn_impl). Measured v5e r3: the
    # projection-fused Pallas block is 1.50x einsum at the packed decoder
    # shape (B1024, T128, d384, h12 — the small-matmul pathology), but 0.62x
    # at the encoder shape (d768) where XLA's batched dot already tiles
    # well, so the win is decoder-only (PERF.md round 3).
    attn_impl_decoder: Optional[str] = None

    def __post_init__(self):
        if self.size == "large":
            object.__setattr__(self, "encoder_layers", 24)
            object.__setattr__(self, "encoder_dim", 1024)
            object.__setattr__(self, "encoder_heads", 16)
        elif self.size == "tiny":
            object.__setattr__(self, "encoder_layers", 2)
            object.__setattr__(self, "encoder_dim", 32)
            object.__setattr__(self, "encoder_heads", 4)
            object.__setattr__(self, "decoder_layers", 2)
            object.__setattr__(self, "decoder_dim", 16)
            object.__setattr__(self, "decoder_heads", 4)

    @property
    def target_length(self) -> int:
        return int(self.sample_rate * self.process_seconds)

    @property
    def frames_per_window(self) -> int:
        return conv_output_length(self.target_length, self.conv_spec)

    @property
    def total_patches(self) -> int:
        n = self.frames_per_window
        if self.extractor == "conv_channel":
            n *= self.in_channels
        return n

    @property
    def embedding_dim(self) -> int:
        return self.conv_spec[-1][0]

    def pos_table(self, dim: int) -> np.ndarray:
        if self.pos_embed == "binaural":
            table = get_binaural_pos_embed(dim, self.frames_per_window)
        else:
            table = get_1d_sincos_pos_embed_from_grid(
                dim, np.arange(self.total_patches, dtype=np.float64)
            )
        return table.astype(np.float32)[None]  # (1, T, dim)


_DTYPE_NAMES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
                "float16": jnp.float16}


def jepa_config_to_dict(cfg: "JEPAConfig") -> dict:
    """JSON-serializable dict of a JEPAConfig (see jepa_config_from_dict).

    Written next to checkpoints (run_dir/model_config.json) so that loaders
    can rebuild the exact architecture — the reference never persists its
    Hydra config with the weights, which forces every consumer to
    re-specify extractor/pos-embed settings by hand (and silently corrupts
    embeddings when they guess wrong, e.g. Nat's positional table)."""
    d = dataclasses.asdict(cfg)
    d["conv_spec"] = [list(layer) for layer in cfg.conv_spec]
    d["dtype"] = np.dtype(cfg.dtype).name
    return d


def jepa_config_from_dict(d: dict) -> "JEPAConfig":
    """Inverse of jepa_config_to_dict; unknown keys are ignored so configs
    written by newer versions still load."""
    fields = {f.name for f in dataclasses.fields(JEPAConfig)}
    kw = {k: v for k, v in d.items() if k in fields}
    if "conv_spec" in kw:
        kw["conv_spec"] = tuple(tuple(layer) for layer in kw["conv_spec"])
    if "dtype" in kw and isinstance(kw["dtype"], str):
        kw["dtype"] = _DTYPE_NAMES[kw["dtype"]]
    return JEPAConfig(**kw)


class JEPA(nn.Module):
    """The JEPA model as a flax module.

    Methods:
      encode_features     waveform → positioned local features (B, T, D_enc)
      student_forward     full masked-prediction pass → preds ((B·N), T, D_enc)
      teacher_forward     local features → top-k-averaged targets (B, T, D_enc)
                          (call with the EMA parameter tree)
      represent           inference: features → context-encoder output
      __call__            init-convenience: runs every submodule once
    """

    config: JEPAConfig

    def setup(self):
        cfg = self.config
        remat_conv = cfg.remat if cfg.remat_conv is None else cfg.remat_conv
        if cfg.extractor == "conv_channel":
            self.extract_audio = ConvChannelFeatureExtractor(
                conv_spec=cfg.conv_spec,
                in_channels=cfg.in_channels,
                mode=cfg.extractor_mode,
                conv_bias=cfg.conv_bias,
                share_weights=cfg.share_weights_over_channels,
                dtype=cfg.dtype,
                remat=remat_conv,
            )
        else:
            self.extract_audio = ConvFeatureExtractor(
                conv_spec=cfg.conv_spec,
                in_channels=cfg.in_channels,
                mode=cfg.extractor_mode,
                conv_bias=cfg.conv_bias,
                dtype=cfg.dtype,
                remat=remat_conv,
            )
        # reference: nn.LayerNorm(extract_audio.embedding_dim), default eps 1e-5
        self.feature_norms = LayerNorm32(eps=1e-5, dtype=cfg.dtype, name="feature_norms")
        self.post_extraction_mapper = (
            nn.Dense(
                cfg.encoder_dim,
                kernel_init=trunc_normal_init(0.02),
                dtype=cfg.dtype,
                name="post_extraction_mapper",
            )
            if cfg.embedding_dim != cfg.encoder_dim
            else None
        )
        mlp = lambda d: int(d * cfg.mlp_ratio)
        remat_enc = cfg.remat if cfg.remat_encoder is None else cfg.remat_encoder
        remat_dec = cfg.remat if cfg.remat_decoder is None else cfg.remat_decoder
        self.encoder = TransformerEncoder(
            num_layers=cfg.encoder_layers,
            embed_dim=cfg.encoder_dim,
            num_heads=cfg.encoder_heads,
            mlp_dim=mlp(cfg.encoder_dim),
            layer_norm_eps=cfg.layer_norm_eps,
            dtype=cfg.dtype,
            remat=remat_enc,
            remat_save_probs=cfg.remat_save_probs,
            attn_impl=resolve_attn_impl(cfg.attn_impl),
            name="encoder",
        )
        self.decoder = TransformerEncoder(
            num_layers=cfg.decoder_layers,
            embed_dim=cfg.decoder_dim,
            num_heads=cfg.decoder_heads,
            mlp_dim=mlp(cfg.decoder_dim),
            layer_norm_eps=cfg.layer_norm_eps,
            dtype=cfg.dtype,
            remat=remat_dec,
            remat_save_probs=cfg.remat_save_probs,
            attn_impl=resolve_attn_impl(
                cfg.attn_impl
                if cfg.attn_impl_decoder is None
                else cfg.attn_impl_decoder
            ),
            name="decoder",
        )
        self.encoder_to_decoder_mapper = nn.Dense(
            cfg.decoder_dim,
            kernel_init=trunc_normal_init(0.02),
            dtype=cfg.dtype,
            name="encoder_to_decoder_mapper",
        )
        self.decoder_to_encoder_mapper = nn.Dense(
            cfg.encoder_dim,
            kernel_init=trunc_normal_init(0.02),
            dtype=cfg.dtype,
            name="decoder_to_encoder_mapper",
        )
        # reference initializes the mask token N(0, 0.02) (jepa.py:135-138)
        self.mask_token = self.param(
            "mask_token",
            lambda key, shape, dtype: 0.02
            * jax.random.normal(key, shape, jnp.float32).astype(dtype),
            (1, 1, cfg.decoder_dim),
            jnp.float32,
        )
        # fixed (non-trainable) sin-cos tables, baked in as constants
        self.pos_encoding_encoder = jnp.asarray(self.config.pos_table(cfg.encoder_dim))
        self.pos_encoding_decoder = jnp.asarray(self.config.pos_table(cfg.decoder_dim))

    # ---------------------------------------------------------------- features

    def encode_features(self, audio: jax.Array) -> jax.Array:
        """(B, C, T_samples) → (B, total_patches, D_enc) positioned features.

        Reference forward lines jepa.py:391-396. Conv blocks are
        individually rematerialized under cfg.remat (see
        ConvFeatureExtractor.remat) — their layer outputs (e.g. 1.57 GB for
        block_0 at batch 256) would otherwise all be saved for backward.
        """
        x = self.extract_audio(audio)
        x = self.feature_norms(x)
        if self.post_extraction_mapper is not None:
            x = self.post_extraction_mapper(x)
        return x + self.pos_encoding_encoder.astype(x.dtype)

    # ---------------------------------------------------------------- student

    def student_forward(
        self,
        local_features: jax.Array,
        ctx_mask: jax.Array,
        ctx_and_target_mask: jax.Array,
    ) -> jax.Array:
        """Masked-prediction pass.

        Args:
            local_features: (B, T, D_enc) positioned features.
            ctx_mask: (B, T) bool, True = NOT part of the context.
            ctx_and_target_mask: (B, N, T) bool, True = visible to the
                predictor for that target group (context ∪ that group's
                targets) — note the reference passes this as
                src_key_padding_mask where True = *masked*, built by XOR at
                masking.py:116; we follow the same convention: True = masked.

        Returns:
            preds: (B, N, T, D_enc) predictor outputs in encoder space.
        """
        b, t, _ = local_features.shape
        n = ctx_and_target_mask.shape[1]
        if self.config.pack_encoder is not None:
            return self._student_forward_packed(
                local_features, ctx_mask, ctx_and_target_mask
            )
        enc_out = self.encoder(local_features, key_padding_mask=ctx_mask)
        projected = self.encoder_to_decoder_mapper(enc_out)  # (B, T, D_dec)
        mask_tok = self.mask_token.astype(projected.dtype)
        # scatter-equivalent select (see module docstring)
        dec_in = jnp.where(ctx_mask[..., None], mask_tok, projected)
        dec_in = dec_in + self.pos_encoding_decoder.astype(dec_in.dtype)
        # repeat per target group, absorb into batch (jepa.py:432-435)
        dec_in = jnp.broadcast_to(dec_in[:, None], (b, n, t, dec_in.shape[-1]))
        dec_in = dec_in.reshape(b * n, t, dec_in.shape[-1])
        kpm = ctx_and_target_mask.reshape(b * n, t)
        dec_out = self.decoder(dec_in, key_padding_mask=kpm)
        preds = self.decoder_to_encoder_mapper(dec_out)
        return preds.reshape(b, n, t, -1)

    def _student_forward_packed(
        self,
        local_features: jax.Array,
        ctx_mask: jax.Array,
        ctx_and_target_mask: jax.Array,
    ) -> jax.Array:
        """student_forward with visible tokens gathered into static P-slot
        buffers (see JEPAConfig.pack_encoder). Numerically equivalent to the
        unpacked path at used positions: attention runs over the same visible
        key sets, per-token norms/MLPs are position-independent, and outputs
        at positions outside the pack are zero — the masked loss never reads
        them (targets are always packed).

        Requires per-row visible counts <= pack sizes: ctx visible <=
        pack_encoder (caller-canonicalized), group visible <= pack_decoder
        (structural for the time-inverse masker)."""
        preds_p, order_d, valid_d = self._packed_predictions(
            local_features, ctx_mask, ctx_and_target_mask
        )
        b, t, _ = local_features.shape
        n = ctx_and_target_mask.shape[1]
        pd = self.config.pack_decoder
        # ---- scatter predictions back to the full token grid ----
        de = preds_p.shape[-1]
        scatter_d = jnp.where(valid_d, order_d, t).reshape(b * n, pd)
        zeros = jnp.zeros((b * n, t, de), preds_p.dtype)
        preds = jax.vmap(lambda z, i, p: z.at[i].set(p, mode="drop"))(
            zeros, scatter_d, preds_p
        )
        return preds.reshape(b, n, t, de)

    def _packed_predictions(
        self,
        local_features: jax.Array,
        ctx_mask: jax.Array,
        ctx_and_target_mask: jax.Array,
    ):
        """Packed encoder→decoder pass; returns (preds_p (B·N, Pd, D_enc),
        order_d (B, N, Pd) token indices, valid_d (B, N, Pd))."""
        cfg = self.config
        b, t, _ = local_features.shape
        n = ctx_and_target_mask.shape[1]
        pe, pd = cfg.pack_encoder, cfg.pack_decoder

        # ---- encoder on packed visible-context tokens ----
        # stable bool argsort: visible (False) first, position order kept
        order_e = jnp.argsort(ctx_mask, axis=-1, stable=True)[:, :pe]  # (B,Pe)
        valid_e = jnp.take_along_axis(~ctx_mask, order_e, axis=-1)  # (B,Pe)
        xe = jnp.take_along_axis(local_features, order_e[..., None], axis=1)
        enc_out = self.encoder(xe, key_padding_mask=~valid_e)  # (B,Pe,D)
        projected = self.encoder_to_decoder_mapper(enc_out)  # (B,Pe,Dd)

        # ---- scatter into the mask-token canvas, add positions ----
        dd = projected.shape[-1]
        mask_tok = self.mask_token.astype(projected.dtype)
        base = jnp.broadcast_to(mask_tok, (b, t, dd))
        scatter_e = jnp.where(valid_e, order_e, t)  # invalid slots -> dropped
        canvas = jax.vmap(lambda c, i, p: c.at[i].set(p, mode="drop"))(
            base, scatter_e, projected
        )
        dec_in = canvas + self.pos_encoding_decoder.astype(canvas.dtype)

        # ---- decoder on packed (context ∪ group-target) tokens ----
        # targets-first pack order: rank 0 = target (visible ∧ non-context),
        # 1 = visible context, 2 = masked. Guarantees loss-read target
        # positions are ALWAYS packed; if a rare group's visible count
        # exceeds pack_decoder (p≲1e-4 at the AudioSet config with the
        # aggressive 128 budget), only its positionally-last context tokens
        # fall out of that group's key set.
        visible_d = ~ctx_and_target_mask  # (B, N, T)
        is_target = visible_d & ctx_mask[:, None, :]
        rank = jnp.where(is_target, 0, jnp.where(visible_d, 1, 2)).astype(jnp.int8)
        order_d = jnp.argsort(rank, axis=-1, stable=True)[..., :pd]
        valid_d = jnp.take_along_axis(visible_d, order_d, axis=-1)
        dec_g = jnp.take_along_axis(
            jnp.broadcast_to(dec_in[:, None], (b, n, t, dd)),
            order_d[..., None],
            axis=2,
        ).reshape(b * n, pd, dd)
        kpm = (~valid_d).reshape(b * n, pd)
        dec_out = self.decoder(dec_g, key_padding_mask=kpm)
        preds_p = self.decoder_to_encoder_mapper(dec_out)  # (B·N,Pd,De)
        return preds_p, order_d, valid_d

    def packed_prediction_loss(
        self,
        local_features: jax.Array,
        ctx_mask: jax.Array,
        ctx_and_target_mask: jax.Array,
        targets: jax.Array,
        target_masks: jax.Array,
        return_terms: bool = False,
    ):
        """Masked MSE computed in packed space: instead of scattering
        predictions back to the full (B, N, T, D) grid and reading it with a
        full-grid mask (masked_prediction_loss), gather the teacher targets
        into the packed layout. Same result — targets are always packed
        (targets-first order) and non-target packed positions get zero
        weight; the normalizer uses the full target count like the
        reference (jepa.py:335-362).

        With ``return_terms`` the unreduced ``(numerator, denominator)``
        pair is returned instead of their ratio — the gradient-accumulation
        path (train/step.py) sums terms across microbatches so the global
        normalizer matches the reference's whole-batch mean exactly."""
        preds_p, order_d, valid_d = self._packed_predictions(
            local_features, ctx_mask, ctx_and_target_mask
        )
        b, n, pd = order_d.shape
        tgt_p = jnp.take_along_axis(
            jnp.broadcast_to(
                targets[:, None], (b, n) + targets.shape[1:]
            ),
            order_d[..., None],
            axis=2,
        )  # (B, N, Pd, D)
        w_p = jnp.take_along_axis(target_masks, order_d, axis=-1) & valid_d
        diff = preds_p.reshape(b, n, pd, -1).astype(jnp.float32) - tgt_p.astype(
            jnp.float32
        )
        per = jnp.mean(jnp.square(diff), axis=-1)  # (B, N, Pd)
        num = jnp.sum(per * w_p.astype(jnp.float32))
        den = jnp.sum(target_masks.astype(jnp.float32))
        if return_terms:
            return num, den
        return num / (den + 1e-8)

    # ---------------------------------------------------------------- teacher

    def teacher_forward(self, local_features: jax.Array) -> jax.Array:
        """Targets from the (EMA) encoder: average of the last k layer
        outputs, each instance-normed before averaging.

        Matches reference `_forward_teacher` + `_make_targets`
        (jepa.py:230-270): raw layer iteration (no final norm, no padding
        mask); F.instance_norm applied to the (L, B, D, T) stack, i.e. stats
        per (layer, sample) over BOTH features and time.
        """
        k = self.config.average_top_k_layers
        outs = self.encoder.layer_outputs(local_features)[-k:]
        if k <= 1:
            return outs[-1]
        # incremental mean of per-layer instance-normed outputs — identical
        # math to stacking all k then normalizing (stats are per layer), but
        # never materializes the (k, B, T, D) f32 stack (2.5 GB at the bench
        # batch)
        acc = None
        for x in outs:
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
            var = jnp.var(x32, axis=(1, 2), keepdims=True)
            normed = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
            acc = normed if acc is None else acc + normed
        return acc / k  # (B, T, D)

    # ---------------------------------------------------------------- inference

    def represent(
        self, audio: jax.Array, padding_mask: Optional[jax.Array] = None
    ) -> jax.Array:
        """Inference representation (reference get_audio_representation,
        jepa.py:456-467): features → context encoder with optional padding
        mask → (B, T, D_enc)."""
        feats = self.encode_features(audio)
        return self.encoder(feats, key_padding_mask=padding_mask)

    # ---------------------------------------------------------------- init path

    def __call__(
        self,
        audio: jax.Array,
        ctx_mask: Optional[jax.Array] = None,
        ctx_and_target_mask: Optional[jax.Array] = None,
    ):
        """Runs every submodule once so `.init` creates all params."""
        feats = self.encode_features(audio)
        b, t, _ = feats.shape
        if ctx_mask is None:
            ctx_mask = jnp.zeros((b, t), bool)
        if ctx_and_target_mask is None:
            ctx_and_target_mask = jnp.zeros((b, 1, t), bool)
        preds = self.student_forward(feats, ctx_mask, ctx_and_target_mask)
        targets = self.teacher_forward(feats)
        return preds, targets


def masked_prediction_loss(
    preds: jax.Array,
    targets: jax.Array,
    target_indices: jax.Array,
    return_terms: bool = False,
):
    """Mean-squared error over target positions only.

    preds: (B, N, T, D); targets: (B, T, D); target_indices: (B, N, T) bool.
    Matches reference masked_loss (jepa.py:335-362): per-timestep MSE mean
    over D, weighted by the target mask, normalized by the mask count.
    Computed in f32 regardless of activation dtype. ``return_terms``
    returns the unreduced (numerator, denominator) for exact cross-
    microbatch accumulation (train/step.py).
    """
    preds = preds.astype(jnp.float32)
    targets = targets.astype(jnp.float32)[:, None]  # (B, 1, T, D)
    per_t = jnp.mean(jnp.square(preds - targets), axis=-1)  # (B, N, T)
    w = target_indices.astype(jnp.float32)
    num = jnp.sum(per_t * w)
    den = jnp.sum(w)
    if return_terms:
        return num, den
    return num / (den + 1e-8)
