"""CLIP-style text encoder (flax) + tokenizer interface.

The reference loads OpenAI CLIP at runtime inside the t2i UNet
(unet/cond_unet_t2i.py:694-698, :860) and feeds the pooled text embedding
to per-scale CondAttention. We provide:

  * CLIPTextEncoder — the ViT-B text tower architecture (token embedding,
    learned positions, causal transformer, LN, eos-pooled projection) so
    released CLIP weights can be converted in (same transpose rules as
    utils/torch_convert).
  * ByteTokenizer — a dependency-free fallback (utf-8 bytes + bos/eos)
    matching CLIP's 77-token context so the t2i pipeline runs end-to-end
    without the BPE vocab file; swap in a real BPE via the same interface.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class ByteTokenizer:
    """utf-8 byte fallback tokenizer with CLIP-style bos/eos framing."""

    def __init__(self, context_length: int = 77):
        self.context_length = context_length
        self.bos = 256
        self.eos = 257
        self.vocab_size = 258

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.context_length), np.int32)
        for i, t in enumerate(texts):
            ids = [self.bos] + list(t.encode("utf-8"))[: self.context_length - 2]
            ids.append(self.eos)
            out[i, : len(ids)] = ids
        return out


class _ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    act: str = "gelu"  # OpenAI CLIP weights need 'quick_gelu'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, mask: Array) -> Array:
        # eps 1e-5: torch nn.LayerNorm's default, which OpenAI CLIP uses —
        # flax's 1e-6 default drifts ~1%/layer on CLIP-scale embeddings
        # (caught by tests/test_weight_drop.py::test_clip_text_ckpt_drop)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_1")(x).astype(x.dtype)
        b, n, c = y.shape
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="attn_qkv")(y)
        qkv = qkv.reshape(b, n, 3, self.heads, c // self.heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scale = (c // self.heads) ** -0.5
        att = jnp.einsum(
            "bihd,bjhd->bhij",
            q.astype(jnp.float32) * scale,
            k.astype(jnp.float32),
        )
        att = jax.nn.softmax(att + mask[None, None], axis=-1)
        o = jnp.einsum("bhij,bjhd->bihd", att, v.astype(jnp.float32))
        o = o.reshape(b, n, c).astype(x.dtype)
        x = x + nn.Dense(c, dtype=self.dtype, name="attn_out")(o)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_2")(x).astype(x.dtype)
        y = nn.Dense(4 * c, dtype=self.dtype, name="mlp_fc")(y)
        if self.act == "quick_gelu":
            y = y * jax.nn.sigmoid(1.702 * y)
        else:
            y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(c, dtype=self.dtype, name="mlp_proj")(y)
        return x + y


def convert_clip_text(sd) -> dict:
    """OpenAI CLIP state_dict (text tower keys) -> CLIPTextEncoder params.

    Handles both raw CLIP checkpoints (token_embedding.weight,
    positional_embedding, transformer.resblocks.N.*, ln_final.*,
    text_projection) and prefixed variants. in_proj_weight packs q|k|v.
    """
    import numpy as np

    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in sd.items()}
    # strip an optional leading 'clip.' / 'model.' prefix
    for prefix in ("clip.", "model."):
        if any(k.startswith(prefix + "token_embedding") for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    out = {
        "token_embedding": {"embedding": sd["token_embedding.weight"]},
        "positional_embedding": sd["positional_embedding"],
        "ln_final": {"scale": sd["ln_final.weight"], "bias": sd["ln_final.bias"]},
        "text_projection": sd["text_projection"],
    }
    i = 0
    while f"transformer.resblocks.{i}.ln_1.weight" in sd:
        p = f"transformer.resblocks.{i}"
        out[f"resblock_{i}"] = {
            "ln_1": {"scale": sd[f"{p}.ln_1.weight"], "bias": sd[f"{p}.ln_1.bias"]},
            "ln_2": {"scale": sd[f"{p}.ln_2.weight"], "bias": sd[f"{p}.ln_2.bias"]},
            "attn_qkv": {
                "kernel": np.ascontiguousarray(sd[f"{p}.attn.in_proj_weight"].T),
                "bias": sd[f"{p}.attn.in_proj_bias"],
            },
            "attn_out": {
                "kernel": np.ascontiguousarray(sd[f"{p}.attn.out_proj.weight"].T),
                "bias": sd[f"{p}.attn.out_proj.bias"],
            },
            "mlp_fc": {
                "kernel": np.ascontiguousarray(sd[f"{p}.mlp.c_fc.weight"].T),
                "bias": sd[f"{p}.mlp.c_fc.bias"],
            },
            "mlp_proj": {
                "kernel": np.ascontiguousarray(sd[f"{p}.mlp.c_proj.weight"].T),
                "bias": sd[f"{p}.mlp.c_proj.bias"],
            },
        }
        i += 1
    return {"params": out}


class CLIPTextEncoder(nn.Module):
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    embed_dim: int = 512
    act: str = "gelu"  # 'quick_gelu' for converted OpenAI CLIP weights
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: Array) -> Array:
        """tokens (B, ctx) int32 -> pooled text embedding (B, embed_dim)."""
        b, n = tokens.shape
        tok_emb = nn.Embed(
            self.vocab_size, self.width, dtype=self.dtype, name="token_embedding"
        )(tokens)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = tok_emb + pos[None, :n]
        mask = jnp.triu(jnp.full((n, n), -jnp.inf), k=1)
        for i in range(self.layers):
            x = _ResidualAttentionBlock(
                self.width, self.heads, act=self.act, dtype=self.dtype,
                name=f"resblock_{i}",
            )(x, mask)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_final")(x).astype(self.dtype)
        # pool at the last (highest-index) token per sequence (CLIP eos pool)
        eos_idx = jnp.argmax(tokens, axis=-1)
        pooled = x[jnp.arange(b), eos_idx]
        proj = self.param(
            "text_projection",
            nn.initializers.normal(self.width**-0.5),
            (self.width, self.embed_dim),
        )
        return pooled @ proj
