"""Native Whisper encoder-decoder for WER/CER evaluation.

The reference's eval loads OpenAI Whisper ``medium.en`` through the
``whisper`` package (reference ``eval.py:18,156``) and transcribes each
converted utterance.  Here the model is rebuilt TPU-first:

  * **Stacked layer params + ``lax.scan`` over layers** — the 24-layer
    encoder/decoder stacks compile as ONE scanned layer body instead of
    24 unrolled blocks, cutting XLA compile time and keeping the
    per-layer matmuls MXU-shaped.
  * **Whisper log-mel frontend in jnp** (matmul DFT — same discipline as
    ``audio/mel.py``): hann/400/160, power spectrum, slaney mel, log10,
    8 dB dynamic-range floor, ``(x+4)/4`` scaling.
  * **KV-cached greedy decode as one jitted ``lax.scan``** over a static
    ``max_len`` — fixed shapes, no host round-trips per token; cross-
    attention K/V are precomputed once from the encoder output.

Weights load from a HuggingFace ``WhisperForConditionalGeneration``
state dict via :func:`convert_hf_state_dict` (the released
openai/whisper-medium.en checkpoint maps 1:1); parity is validated
random-init against transformers in ``tests/test_whisper.py`` exactly
like HuBERT (``models/hubert.py``).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dissc_tpu.audio.mel import mel_filterbank


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    """Architecture hyper-params (defaults: medium.en)."""

    vocab_size: int = 51864
    num_mel_bins: int = 80
    d_model: int = 1024
    encoder_layers: int = 24
    decoder_layers: int = 24
    num_heads: int = 16
    ffn_dim: int = 4096
    max_source_positions: int = 1500
    max_target_positions: int = 448
    eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads


# ---------------------------------------------------------------------------
# Log-mel frontend (whisper audio.py semantics)
# ---------------------------------------------------------------------------

N_FFT = 400
HOP = 160
SAMPLE_RATE = 16000
CHUNK_SAMPLES = 30 * SAMPLE_RATE  # 480000 -> 3000 mel frames


@functools.lru_cache(maxsize=2)
def _whisper_dft(n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    k = np.arange(n_fft // 2 + 1)
    n = np.arange(n_fft)
    ang = -2.0 * np.pi * np.outer(n, k) / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def log_mel_spectrogram(wav: jax.Array, num_mels: int = 80) -> jax.Array:
    """[B, 480000] padded/trimmed waveform -> [B, 3000, num_mels] log-mel.

    Whisper's frontend: centred STFT (reflect pad n_fft//2), periodic
    hann window, power spectrum with the LAST frame dropped, slaney mel
    filters (librosa defaults, fmin=0 fmax=sr/2), ``log10(clamp(1e-10))``
    floored at ``max - 8`` then ``(x + 4) / 4``.  The DFT runs as two
    real matmuls (MXU path) like ``audio/mel.py``.
    """
    b, t = wav.shape
    pad = N_FFT // 2
    y = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (t + 2 * pad - N_FFT) // HOP
    idx = jnp.arange(n_frames)[:, None] * HOP + jnp.arange(N_FFT)[None, :]
    frames = y[:, idx]  # [B, F, 400]
    window = jnp.asarray(np.hanning(N_FFT + 1)[:-1].astype(np.float32))
    frames = frames * window
    cos_b, sin_b = _whisper_dft(N_FFT)
    re = jnp.matmul(frames, jnp.asarray(cos_b), precision=jax.lax.Precision.HIGHEST)
    im = jnp.matmul(frames, jnp.asarray(sin_b), precision=jax.lax.Precision.HIGHEST)
    power = (re * re + im * im)[:, :-1, :]  # drop last frame (whisper audio.py)
    mel = jnp.asarray(mel_filterbank(SAMPLE_RATE, N_FFT, num_mels, 0.0, None))
    melspec = jnp.einsum("bfk,mk->bfm", power, mel,
                         precision=jax.lax.Precision.HIGHEST)
    log_spec = jnp.log10(jnp.clip(melspec, min=1e-10))
    floor = jnp.max(log_spec, axis=(1, 2), keepdims=True) - 8.0
    return (jnp.maximum(log_spec, floor) + 4.0) / 4.0


def pad_or_trim(wav: np.ndarray, length: int = CHUNK_SAMPLES) -> np.ndarray:
    """Whisper's 30 s chunking contract (audio.py pad_or_trim)."""
    if len(wav) >= length:
        return wav[:length]
    return np.pad(wav, (0, length - len(wav)))


# ---------------------------------------------------------------------------
# Attention / layer primitives (pure functions over a param dict)
# ---------------------------------------------------------------------------


def _ln(p, x, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _heads(x, nh):
    return x.reshape(*x.shape[:-1], nh, x.shape[-1] // nh)


def _proj_qkv(p, q_x, kv_x, nh):
    """q scaled by head_dim**-0.5 (HF WhisperAttention); k has no bias."""
    hd = q_x.shape[-1] // nh
    q = _heads(q_x @ p["q"]["kernel"] + p["q"]["bias"], nh) * (hd ** -0.5)
    k = _heads(kv_x @ p["k"]["kernel"], nh)
    v = _heads(kv_x @ p["v"]["kernel"] + p["v"]["bias"], nh)
    return q, k, v


def _attend(p, q, k, v, mask=None):
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
    if mask is not None:
        scores = jnp.where(mask, scores, -1e9)
    attn = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
    ctx = ctx.reshape(*ctx.shape[:-2], -1)
    return ctx @ p["out"]["kernel"] + p["out"]["bias"]


def _ffn(p, x):
    h = jax.nn.gelu(x @ p["fc1"]["kernel"] + p["fc1"]["bias"], approximate=False)
    return h @ p["fc2"]["kernel"] + p["fc2"]["bias"]


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def encode(params: Dict, cfg: WhisperConfig, mel: jax.Array) -> jax.Array:
    """[B, 2*max_source_positions, n_mels] log-mel -> [B, Tsrc, d] states.

    conv1 (k=3) -> gelu -> conv2 (k=3, stride 2) -> gelu -> +sinusoid
    positions -> scanned pre-LN transformer stack -> final LN.
    """
    enc = params["encoder"]
    h = jax.lax.conv_general_dilated(
        mel, enc["conv1"]["kernel"], window_strides=(1,), padding=[(1, 1)],
        dimension_numbers=("NWC", "WIO", "NWC")) + enc["conv1"]["bias"]
    h = jax.nn.gelu(h, approximate=False)
    h = jax.lax.conv_general_dilated(
        h, enc["conv2"]["kernel"], window_strides=(2,), padding=[(1, 1)],
        dimension_numbers=("NWC", "WIO", "NWC")) + enc["conv2"]["bias"]
    h = jax.nn.gelu(h, approximate=False)
    h = h + enc["pos"][None, : h.shape[1]]

    nh, eps = cfg.num_heads, cfg.eps

    def layer(x, lp):
        r = x
        y = _ln(lp["attn_ln"], x, eps)
        q, k, v = _proj_qkv(lp["attn"], y, y, nh)
        x = r + _attend(lp["attn"], q, k, v)
        r = x
        y = _ln(lp["ffn_ln"], x, eps)
        return r + _ffn(lp, y), None

    h, _ = jax.lax.scan(layer, h, enc["layers"])
    return _ln(enc["ln"], h, eps)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _cross_kv(params: Dict, cfg: WhisperConfig, enc_out: jax.Array):
    """Precompute per-layer cross-attention K/V: two [L, B, Tsrc, H, hd]."""
    nh = cfg.num_heads

    def layer(_, lp):
        k = _heads(enc_out @ lp["xattn"]["k"]["kernel"], nh)
        v = _heads(enc_out @ lp["xattn"]["v"]["kernel"] + lp["xattn"]["v"]["bias"], nh)
        return None, (k, v)

    _, (ks, vs) = jax.lax.scan(layer, None, params["decoder"]["layers"])
    return ks, vs


def decode_full(params: Dict, cfg: WhisperConfig, tokens: jax.Array,
                enc_out: jax.Array) -> jax.Array:
    """Teacher-forced decoder: [B, Ttgt] tokens -> [B, Ttgt, vocab] logits.

    Used for parity testing and any loss computation; generation uses
    the cached :func:`greedy_decode` path instead.
    """
    dec = params["decoder"]
    nh, eps = cfg.num_heads, cfg.eps
    ttgt = tokens.shape[1]
    h = dec["embed"][tokens] + dec["pos"][None, :ttgt]
    causal = jnp.tril(jnp.ones((ttgt, ttgt), bool))[None, None]

    def layer(x, lp):
        r = x
        y = _ln(lp["attn_ln"], x, eps)
        q, k, v = _proj_qkv(lp["attn"], y, y, nh)
        x = r + _attend(lp["attn"], q, k, v, mask=causal)
        r = x
        y = _ln(lp["xattn_ln"], x, eps)
        q, k, v = _proj_qkv(lp["xattn"], y, enc_out, nh)
        x = r + _attend(lp["xattn"], q, k, v)
        r = x
        y = _ln(lp["ffn_ln"], x, eps)
        return r + _ffn(lp, y), None

    h, _ = jax.lax.scan(layer, h, dec["layers"])
    h = _ln(dec["ln"], h, eps)
    return h @ dec["embed"].T  # tied proj_out (no bias)


def greedy_decode(params: Dict, cfg: WhisperConfig, mel: jax.Array,
                  initial_tokens: jax.Array, eos_id: int,
                  max_len: int = 224,
                  suppress_ids: Optional[jax.Array] = None) -> jax.Array:
    """One jitted program: encode + KV-cached greedy decode.

    ``initial_tokens`` is the forced prompt ([n_init] int32, e.g.
    ``<|startoftranscript|> <|notimestamps|>`` for .en models) shared by
    the whole batch.  Returns [B, max_len] int32 padded with ``eos_id``
    after the first EOS.  The loop is a ``lax.scan`` over a static
    ``max_len`` with per-layer self-attention KV caches — fixed shapes,
    zero host synchronisation per token.
    """
    dec = params["decoder"]
    nh, hd, eps = cfg.num_heads, cfg.head_dim, cfg.eps
    b = mel.shape[0]
    n_init = initial_tokens.shape[0]
    total = n_init + max_len
    nl = cfg.decoder_layers

    enc_out = encode(params, cfg, mel)
    xk, xv = _cross_kv(params, cfg, enc_out)  # [L, B, Tsrc, H, hd]

    k_cache = jnp.zeros((nl, b, total, nh, hd), enc_out.dtype)
    v_cache = jnp.zeros((nl, b, total, nh, hd), enc_out.dtype)
    valid0 = jnp.zeros((total,), bool)

    def step_token(carry, tok, pos):
        """Run one token through the stack; returns logits + new caches."""
        k_cache, v_cache, valid = carry
        x = (jnp.take(dec["embed"], tok, axis=0)[:, None, :]
             + jax.lax.dynamic_slice_in_dim(jnp.asarray(dec["pos"]), pos, 1)[None])
        valid = valid.at[pos].set(True)

        def layer(x, lp_and_cache):
            lp, kc, vc, xk_l, xv_l = lp_and_cache
            r = x
            y = _ln(lp["attn_ln"], x, eps)
            q, k, v = _proj_qkv(lp["attn"], y, y, nh)
            kc = jax.lax.dynamic_update_slice_in_dim(kc, k, pos, axis=1)
            vc = jax.lax.dynamic_update_slice_in_dim(vc, v, pos, axis=1)
            x = r + _attend(lp["attn"], q, kc, vc,
                            mask=valid[None, None, None, :])
            r = x
            y = _ln(lp["xattn_ln"], x, eps)
            hdm = y.shape[-1] // nh
            q = _heads(y @ lp["xattn"]["q"]["kernel"] + lp["xattn"]["q"]["bias"],
                       nh) * (hdm ** -0.5)
            x = r + _attend(lp["xattn"], q, xk_l, xv_l)
            r = x
            y = _ln(lp["ffn_ln"], x, eps)
            return r + _ffn(lp, y), (kc, vc)

        x, (k_cache, v_cache) = jax.lax.scan(
            layer, x, (dec["layers"], k_cache, v_cache, xk, xv))
        x = _ln(dec["ln"], x, eps)
        logits = x[:, 0] @ dec["embed"].T
        return (k_cache, v_cache, valid), logits

    # feed the forced prompt (unrolled: n_init is tiny and static)
    carry = (k_cache, v_cache, valid0)
    logits = None
    for i in range(n_init):
        tok = jnp.broadcast_to(initial_tokens[i], (b,))
        carry, logits = step_token(carry, tok, i)

    if suppress_ids is not None:
        supp = jnp.zeros((cfg.vocab_size,)).at[suppress_ids].set(-jnp.inf)
    else:
        supp = jnp.zeros((cfg.vocab_size,))

    def gen_step(state, i):
        carry, logits, done = state
        tok = jnp.argmax(logits + supp, axis=-1).astype(jnp.int32)
        tok = jnp.where(done, eos_id, tok)
        done = done | (tok == eos_id)
        carry, logits = step_token(carry, tok, n_init + i)
        return (carry, logits, done), tok

    done0 = jnp.zeros((b,), bool)
    _, toks = jax.lax.scan(
        gen_step, (carry, logits, done0), jnp.arange(max_len))
    return toks.T  # [B, max_len]


# ---------------------------------------------------------------------------
# Init / checkpoint conversion
# ---------------------------------------------------------------------------


def _stack(trees):
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *trees)


def init_params(cfg: WhisperConfig, key: jax.Array) -> Dict:
    """Random params with the converted-checkpoint tree layout (bench use)."""
    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))

    def mat(*shape, scale=0.02):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def lin(n, m, bias=True):
        d = {"kernel": mat(n, m)}
        if bias:
            d["bias"] = np.zeros(m, np.float32)
        return d

    def ln(n):
        return {"scale": np.ones(n, np.float32), "bias": np.zeros(n, np.float32)}

    d, f = cfg.d_model, cfg.ffn_dim

    def attn():
        return {"q": lin(d, d), "k": lin(d, d, bias=False), "v": lin(d, d),
                "out": lin(d, d)}

    def enc_layer():
        return {"attn": attn(), "attn_ln": ln(d), "fc1": lin(d, f),
                "fc2": lin(f, d), "ffn_ln": ln(d)}

    def dec_layer():
        return {**enc_layer(), "xattn": attn(), "xattn_ln": ln(d)}

    return {
        "encoder": {
            "conv1": {"kernel": mat(3, cfg.num_mel_bins, d),
                      "bias": np.zeros(d, np.float32)},
            "conv2": {"kernel": mat(3, d, d), "bias": np.zeros(d, np.float32)},
            "pos": mat(cfg.max_source_positions, d),
            "layers": _stack([enc_layer() for _ in range(cfg.encoder_layers)]),
            "ln": ln(d),
        },
        "decoder": {
            "embed": mat(cfg.vocab_size, d),
            "pos": mat(cfg.max_target_positions, d),
            "layers": _stack([dec_layer() for _ in range(cfg.decoder_layers)]),
            "ln": ln(d),
        },
    }


def convert_hf_state_dict(sd: Dict[str, Any],
                          cfg: WhisperConfig) -> Dict:
    """Map a ``WhisperForConditionalGeneration.state_dict()`` to our tree.

    Layer params are STACKED along a leading layer axis (the scan
    layout); torch ``[out, in]`` linear weights transpose to ``[in,
    out]`` kernels and ``[out, in, k]`` conv weights to WIO.
    """

    def t(name):
        x = sd[name]
        return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)

    def lin(prefix, bias=True):
        d = {"kernel": t(f"{prefix}.weight").T}
        if bias:
            d["bias"] = t(f"{prefix}.bias")
        return d

    def lnp(prefix):
        return {"scale": t(f"{prefix}.weight"), "bias": t(f"{prefix}.bias")}

    def attn(prefix):
        return {"q": lin(f"{prefix}.q_proj"), "k": lin(f"{prefix}.k_proj", bias=False),
                "v": lin(f"{prefix}.v_proj"), "out": lin(f"{prefix}.out_proj")}

    def enc_layer(i):
        p = f"model.encoder.layers.{i}"
        return {"attn": attn(f"{p}.self_attn"),
                "attn_ln": lnp(f"{p}.self_attn_layer_norm"),
                "fc1": lin(f"{p}.fc1"), "fc2": lin(f"{p}.fc2"),
                "ffn_ln": lnp(f"{p}.final_layer_norm")}

    def dec_layer(i):
        p = f"model.decoder.layers.{i}"
        return {"attn": attn(f"{p}.self_attn"),
                "attn_ln": lnp(f"{p}.self_attn_layer_norm"),
                "xattn": attn(f"{p}.encoder_attn"),
                "xattn_ln": lnp(f"{p}.encoder_attn_layer_norm"),
                "fc1": lin(f"{p}.fc1"), "fc2": lin(f"{p}.fc2"),
                "ffn_ln": lnp(f"{p}.final_layer_norm")}

    return {
        "encoder": {
            "conv1": {"kernel": t("model.encoder.conv1.weight").transpose(2, 1, 0),
                      "bias": t("model.encoder.conv1.bias")},
            "conv2": {"kernel": t("model.encoder.conv2.weight").transpose(2, 1, 0),
                      "bias": t("model.encoder.conv2.bias")},
            "pos": t("model.encoder.embed_positions.weight"),
            "layers": _stack([enc_layer(i) for i in range(cfg.encoder_layers)]),
            "ln": lnp("model.encoder.layer_norm"),
        },
        "decoder": {
            "embed": t("model.decoder.embed_tokens.weight"),
            "pos": t("model.decoder.embed_positions.weight"),
            "layers": _stack([dec_layer(i) for i in range(cfg.decoder_layers)]),
            "ln": lnp("model.decoder.layer_norm"),
        },
    }


def config_from_hf(hf_cfg) -> WhisperConfig:
    """WhisperConfig from a transformers config object."""
    return WhisperConfig(
        vocab_size=hf_cfg.vocab_size,
        num_mel_bins=hf_cfg.num_mel_bins,
        d_model=hf_cfg.d_model,
        encoder_layers=hf_cfg.encoder_layers,
        decoder_layers=hf_cfg.decoder_layers,
        num_heads=hf_cfg.encoder_attention_heads,
        ffn_dim=hf_cfg.encoder_ffn_dim,
        max_source_positions=hf_cfg.max_source_positions,
        max_target_positions=hf_cfg.max_target_positions,
    )


class WhisperTranscriber:
    """Batched ``wav -> text`` engine around the jitted greedy decoder.

    The tokenizer (text detokenisation + forced prompt ids) comes from
    transformers — the MODEL is native; the tokenizer is a string table.
    """

    def __init__(self, params: Dict, cfg: WhisperConfig, tokenizer,
                 max_len: int = 224):
        self.cfg = cfg
        self.params = jax.device_put(params)
        self.tokenizer = tokenizer
        self.max_len = max_len
        self.eos_id = int(tokenizer.eos_token_id)
        # forced prompt: <|startoftranscript|> [lang/task for multilingual]
        # <|notimestamps|> — prefix_tokens without the timestamp marker
        ids = [tokenizer.convert_tokens_to_ids("<|startoftranscript|>")]
        notimestamps = tokenizer.convert_tokens_to_ids("<|notimestamps|>")
        ids.append(notimestamps)
        self.initial_tokens = jnp.asarray(ids, jnp.int32)
        # suppress special tokens (whisper's non-speech suppression is
        # optional; EOS must stay unsuppressed)
        self._jitted = jax.jit(functools.partial(
            greedy_decode, cfg=self.cfg, eos_id=self.eos_id,
            max_len=self.max_len))

    def transcribe_wav(self, wav: np.ndarray) -> str:
        return self.transcribe_batch([wav])[0]

    def transcribe_batch(self, wavs) -> list:
        """Batched decode: one device program over N padded 30 s chunks.

        The KV-cached greedy scan carries the whole batch, so N files
        cost ~one file's sequential decode — the serving shape for the
        eval sweep (the reference transcribes one file per call,
        ``eval.py:156``).
        """
        mel = log_mel_spectrogram(
            jnp.asarray(np.stack([pad_or_trim(np.asarray(w)) for w in wavs])),
            self.cfg.num_mel_bins)
        toks = np.asarray(self._jitted(self.params, mel=mel,
                                       initial_tokens=self.initial_tokens))
        out = []
        for ids in toks:
            if (ids == self.eos_id).any():
                ids = ids[: int(np.argmax(ids == self.eos_id))]
            out.append(self.tokenizer.decode(ids, skip_special_tokens=True))
        return out

    def __call__(self, path: str) -> str:
        from dissc_tpu.core.wav import read_wav

        wav, sr = read_wav(path, dtype="float32")
        if sr != SAMPLE_RATE:
            from dissc_tpu.audio.resample import resample_poly_np

            wav = resample_poly_np(wav, sr, SAMPLE_RATE)
        return self.transcribe_wav(wav)
