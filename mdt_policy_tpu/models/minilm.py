"""In-repo MiniLM sentence encoder (sentence-transformers family).

The reference's automatic annotator embeds instruction sentences with a
hydra-instantiated language model, and every published CALVIN annotation
folder the shipped dataset configs point at
(`conf/datamodule/datasets/vision_lang_calvin.yaml:34`,
`lang_paraphrase-MiniLM`) was produced by a sentence-transformers
paraphrase-MiniLM model: a BERT encoder + attention-masked mean pooling,
384-d output (`mdt/utils/automatic_lang_annotator_mp.py:321-342` consumes
it as `model.encode(...)`).

This module implements that architecture in Flax so the annotation pipeline
can emit MiniLM-shaped embeddings without sentence-transformers (the
`transformers` tokenizer + torch/safetensors weight loading are still
required — install the `annotate` extra):
`MiniLMEncoder` is a standard post-LN BERT encoder, `port_minilm_weights`
maps a HuggingFace ``BertModel`` state_dict (the storage format of the
published sentence-transformer folders) 1:1 onto it, and
`minilm_embed_fn` wires a local model directory (config.json + weights +
vocab.txt — no egress at embed time) into the annotator's
``embed(sentence)`` contract.
Architecture parity vs torch ``transformers.BertModel`` + mean pooling is
tested in tests/test_minilm.py; with real published weights the same port
path loads them bit-for-bit.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Dict, Mapping, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from mdt_policy_tpu.ops.attention import sdpa

logger = logging.getLogger(__name__)

__all__ = ["MiniLMEncoder", "port_minilm_weights", "minilm_embed_fn",
           "MINILM_L3_CONFIG"]

# paraphrase-MiniLM-L3-v2 — the family behind the published CALVIN
# `lang_paraphrase-MiniLM` annotation folders (384-d sentence embeddings)
MINILM_L3_CONFIG = dict(vocab_size=30522, hidden_size=384, num_layers=3,
                        num_heads=12, intermediate_size=1536,
                        max_position_embeddings=512, type_vocab_size=2,
                        layer_norm_eps=1e-12)


class _BertLayer(nn.Module):
    """Post-LN BERT encoder block (attention -> add&norm -> FFN -> add&norm),
    exactly ``transformers.models.bert`` semantics."""
    hidden_size: int
    num_heads: int
    intermediate_size: int
    layer_norm_eps: float = 1e-12

    @nn.compact
    def __call__(self, x, mask):
        B, T, C = x.shape
        hd = C // self.num_heads
        q = nn.Dense(C, name="query")(x).reshape(B, T, self.num_heads, hd)
        k = nn.Dense(C, name="key")(x).reshape(B, T, self.num_heads, hd)
        v = nn.Dense(C, name="value")(x).reshape(B, T, self.num_heads, hd)
        attn = sdpa(q, k, v, mask=mask, layout="bthd").reshape(B, T, C)
        h = nn.Dense(C, name="attn_out")(attn)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, name="attn_ln")(x + h)
        h = nn.Dense(self.intermediate_size, name="fc1")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(C, name="fc2")(h)
        return nn.LayerNorm(epsilon=self.layer_norm_eps, name="out_ln")(x + h)


class MiniLMEncoder(nn.Module):
    """BERT encoder + attention-masked mean pooling -> (B, hidden_size)
    sentence embeddings (the sentence-transformers Transformer+Pooling(mean)
    stack; paraphrase-MiniLM models apply no output normalization)."""
    vocab_size: int = 30522
    hidden_size: int = 384
    num_layers: int = 3
    num_heads: int = 12
    intermediate_size: int = 1536
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12

    @nn.compact
    def __call__(self, input_ids: jax.Array,
                 attention_mask: Optional[jax.Array] = None) -> jax.Array:
        B, T = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((B, T), jnp.int32)
        word = nn.Embed(self.vocab_size, self.hidden_size,
                        name="word_embeddings")(input_ids)
        pos = self.param("position_embeddings", nn.initializers.normal(0.02),
                         (self.max_position_embeddings, self.hidden_size))
        # token_type always 0 for single-sentence encoding, but the embedding
        # table participates (checkpoint row 0 is not zero)
        ttype = self.param("token_type_embeddings", nn.initializers.normal(0.02),
                           (self.type_vocab_size, self.hidden_size))
        x = word + pos[None, :T] + ttype[0][None, None]
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, name="emb_ln")(x)
        # (B, 1, 1, T) boolean: every query may attend only to real tokens
        attn_mask = attention_mask[:, None, None, :].astype(bool)
        for i in range(self.num_layers):
            x = _BertLayer(self.hidden_size, self.num_heads,
                           self.intermediate_size, self.layer_norm_eps,
                           name=f"layer_{i}")(x, attn_mask)
        # sentence-transformers Pooling(mean): masked token average
        m = attention_mask[..., None].astype(x.dtype)
        return (x * m).sum(axis=1) / jnp.clip(m.sum(axis=1), 1e-9)


def port_minilm_weights(sd: Mapping) -> Dict:
    """HuggingFace BertModel state_dict -> MiniLMEncoder params. Accepts
    bare (``embeddings.*``) or prefixed (``bert.embeddings.*`` /
    ``0_Transformer.*``) key layouts; the unused pooler is ignored."""
    def _np(t):
        if hasattr(t, "detach"):
            t = t.detach().cpu().numpy()
        return np.asarray(t, np.float32)

    # normalize prefixes (bare HF, `bert.`-prefixed, and the
    # sentence-transformers `0_Transformer.`-prefixed flat layouts)
    for pfx in ("bert.", "0_Transformer."):
        sd = {k[len(pfx):] if k.startswith(pfx) else k: v
              for k, v in sd.items()}
    sd = {k: v for k, v in sd.items() if not k.startswith("pooler.")}

    def dense(pfx):
        return {"kernel": _np(sd[f"{pfx}.weight"]).T,
                "bias": _np(sd[f"{pfx}.bias"])}

    def ln(pfx):
        return {"scale": _np(sd[f"{pfx}.weight"]),
                "bias": _np(sd[f"{pfx}.bias"])}

    params: Dict = {
        "word_embeddings": {
            "embedding": _np(sd["embeddings.word_embeddings.weight"])},
        "position_embeddings": _np(sd["embeddings.position_embeddings.weight"]),
        "token_type_embeddings": _np(sd["embeddings.token_type_embeddings.weight"]),
        "emb_ln": ln("embeddings.LayerNorm"),
    }
    n_layers = len({k.split(".")[2] for k in sd if k.startswith("encoder.layer.")})
    for i in range(n_layers):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "query": dense(f"{p}.attention.self.query"),
            "key": dense(f"{p}.attention.self.key"),
            "value": dense(f"{p}.attention.self.value"),
            "attn_out": dense(f"{p}.attention.output.dense"),
            "attn_ln": ln(f"{p}.attention.output.LayerNorm"),
            "fc1": dense(f"{p}.intermediate.dense"),
            "fc2": dense(f"{p}.output.dense"),
            "out_ln": ln(f"{p}.output.LayerNorm"),
        }
    return params


def _load_state_dict(model_dir: Path):
    """Load weights from a local HF/sentence-transformers folder:
    pytorch_model.bin (torch) or model.safetensors."""
    bin_path = model_dir / "pytorch_model.bin"
    if bin_path.exists():
        import torch
        return torch.load(bin_path, map_location="cpu", weights_only=True)
    st_path = model_dir / "model.safetensors"
    if st_path.exists():
        from safetensors.numpy import load_file
        return load_file(st_path)
    raise FileNotFoundError(
        f"no pytorch_model.bin or model.safetensors under {model_dir}")


def minilm_embed_fn(model_dir):
    """``embed(sentence) -> (hidden_size,) float32`` from a LOCAL MiniLM
    model directory (config.json + weights + vocab.txt) — the in-repo
    replacement for ``SentenceTransformer(...).encode`` in zero-egress
    environments. The directory layout is exactly what
    ``SentenceTransformer.save`` / HF ``save_pretrained`` produce."""
    model_dir = Path(model_dir)
    # sentence-transformers nests the transformer module in some layouts
    if not (model_dir / "config.json").exists():
        nested = sorted(model_dir.glob("*Transformer*"))
        if nested:
            model_dir = nested[0]
    hf = json.loads((model_dir / "config.json").read_text())
    enc = MiniLMEncoder(
        vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        intermediate_size=hf["intermediate_size"],
        max_position_embeddings=hf["max_position_embeddings"],
        type_vocab_size=hf.get("type_vocab_size", 2),
        layer_norm_eps=hf.get("layer_norm_eps", 1e-12))
    params = port_minilm_weights(_load_state_dict(model_dir))

    from transformers import BertTokenizerFast
    tok = BertTokenizerFast(str(model_dir / "vocab.txt"),
                            do_lower_case=hf.get("do_lower_case", True))
    max_len = min(hf["max_position_embeddings"], 128)
    apply = jax.jit(lambda ids, mask: enc.apply({"params": params}, ids, mask))

    def embed(sentence: str) -> np.ndarray:
        out = tok([sentence], padding="max_length", truncation=True,
                  max_length=max_len, return_tensors="np")
        return np.asarray(apply(out["input_ids"].astype(np.int32),
                                out["attention_mask"].astype(np.int32)))[0]

    return embed
