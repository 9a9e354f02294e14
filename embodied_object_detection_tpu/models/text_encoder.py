"""CLIP text encoder (flax) + BPE tokenizer — runtime vocabulary embedding.

ref: Detic/detic/modeling/text/text_encoder.py (a vendored openai/CLIP text
transformer used by predictor.py:61-65 to embed arbitrary vocabularies at
runtime). The standard CLIP-B/32 text tower: 49408-token BPE vocab, 77
context, 12 layers x width 512 x 8 heads, causal attention, ln_final +
text_projection; the output is the EOT-token embedding.

Weights and the BPE merge table are external assets (the reference downloads
them); loaders here take explicit paths and fail with a clear message when
absent. For the mp3d/lvis/coco vocabularies the precomputed embedding .npy
files (datasets/metadata/*.npy) make this encoder optional.
"""

from __future__ import annotations

import gzip
import html
import os
from functools import lru_cache
from typing import Any, Dict, List, Optional

import jax
import numpy as np

CONTEXT_LENGTH = 77
VOCAB_SIZE = 49408


# =========================================================================
# BPE tokenizer (byte-level BPE over the public CLIP merge table)
# =========================================================================

@lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    bs = (list(range(ord("!"), ord("~") + 1)) +
          list(range(ord("\xa1"), ord("\xac") + 1)) +
          list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(2 ** 8):
        if b not in bs:
            bs.append(b)
            cs.append(2 ** 8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


class SimpleTokenizer:
    """CLIP's byte-level BPE tokenizer; needs the public merge table
    (bpe_simple_vocab_16e6.txt.gz)."""

    def __init__(self, bpe_path: str):
        if not os.path.exists(bpe_path):
            raise FileNotFoundError(
                f"CLIP BPE vocab not found at {bpe_path}; download "
                "bpe_simple_vocab_16e6.txt.gz (openai/CLIP) or use "
                "precomputed embedding .npy files instead")
        self.byte_encoder = bytes_to_unicode()
        merges = gzip.open(bpe_path).read().decode("utf-8").split("\n")
        merges = merges[1: 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges]
        vocab = list(bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merges:
            vocab.append("".join(m))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = dict(zip(vocab, range(len(vocab))))
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {"<|startoftext|>": "<|startoftext|>",
                      "<|endoftext|>": "<|endoftext|>"}
        import re
        # CLIP's original pattern uses \p{L}/\p{N} (regex module); the
        # stdlib-re ASCII equivalent below matches it for English vocab text.
        self.pat = re.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"
            r"[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+", re.IGNORECASE)

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, 1e10))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                    new_word.extend(word[i:j])
                    i = j
                except ValueError:
                    new_word.extend(word[i:])
                    break
                if word[i] == first and i < len(word) - 1 and \
                        word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        tokens = []
        text = html.unescape(html.unescape(text)).strip().lower()
        for token in self.pat.findall(" ".join(text.split())):
            token = "".join(self.byte_encoder[b]
                            for b in token.encode("utf-8"))
            tokens.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return tokens

    def tokenize(self, texts: List[str],
                 context_length: int = CONTEXT_LENGTH) -> np.ndarray:
        sot = self.encoder["<|startoftext|>"]
        eot = self.encoder["<|endoftext|>"]
        out = np.zeros((len(texts), context_length), np.int32)
        for i, text in enumerate(texts):
            toks = [sot] + self.encode(text)[: context_length - 2] + [eot]
            out[i, : len(toks)] = toks
        return out


# =========================================================================
# Text transformer (flax)
# =========================================================================

def _make_model(width=512, layers=12, heads=8):
    import jax.numpy as jnp
    from flax import linen as nn

    class ResidualBlock(nn.Module):
        @nn.compact
        def __call__(self, x, mask):
            y = nn.LayerNorm(name="ln_1")(x)
            y = nn.SelfAttention(num_heads=heads, qkv_features=width,
                                 name="attn")(y, mask=mask)
            x = x + y
            y = nn.LayerNorm(name="ln_2")(x)
            y = nn.Dense(width * 4, name="mlp_fc")(y)
            y = y * jax.nn.sigmoid(1.702 * y)            # quick-gelu
            y = nn.Dense(width, name="mlp_proj")(y)
            return x + y

    class TextTransformer(nn.Module):
        @nn.compact
        def __call__(self, tokens):                      # [B, 77] int32
            b, t = tokens.shape
            emb = nn.Embed(VOCAB_SIZE, width, name="token_embedding")(tokens)
            pos = self.param("positional_embedding",
                             nn.initializers.normal(0.01),
                             (CONTEXT_LENGTH, width))
            x = emb + pos[None, :t]
            causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
            for i in range(layers):
                x = ResidualBlock(name=f"resblock{i}")(x, causal)
            x = nn.LayerNorm(name="ln_final")(x)
            proj = self.param("text_projection",
                              nn.initializers.normal(width ** -0.5),
                              (width, width))
            eot = jnp.argmax(tokens, axis=-1)            # EOT has max id
            # fp32 projection: these embeddings become zs_weight columns
            # that every downstream fp32-forced contraction consumes
            feats = jnp.dot(x[jnp.arange(b), eot], proj,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
            return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

    return TextTransformer()


class CLIPTextEncoder:
    """Callable: List[str] -> [B, 512] normalized embeddings."""

    def __init__(self, params, bpe_path: str):
        import jax
        self.tokenizer = SimpleTokenizer(bpe_path)
        self.model = _make_model()
        self.params = params
        self._apply = jax.jit(lambda p, t: self.model.apply(p, t))

    def __call__(self, texts: List[str]) -> np.ndarray:
        toks = self.tokenizer.tokenize(texts)
        return np.asarray(self._apply(self.params, toks))


def convert_clip_text_weights(state_dict: Dict[str, np.ndarray]) -> Dict:
    """openai CLIP state_dict (text tower) -> flax params."""
    p: Dict[str, Any] = {}

    def put(path, v):
        node = p
        ks = path.split("/")
        for k in ks[:-1]:
            node = node.setdefault(k, {})
        node[ks[-1]] = np.asarray(v)

    put("token_embedding/embedding", state_dict["token_embedding.weight"])
    put("positional_embedding", state_dict["positional_embedding"])
    put("text_projection", state_dict["text_projection"])
    put("ln_final/scale", state_dict["ln_final.weight"])
    put("ln_final/bias", state_dict["ln_final.bias"])
    width = state_dict["positional_embedding"].shape[1]
    heads = 8
    i = 0
    while f"transformer.resblocks.{i}.ln_1.weight" in state_dict:
        pre = f"transformer.resblocks.{i}"
        blk = f"resblock{i}"
        put(f"{blk}/ln_1/scale", state_dict[f"{pre}.ln_1.weight"])
        put(f"{blk}/ln_1/bias", state_dict[f"{pre}.ln_1.bias"])
        put(f"{blk}/ln_2/scale", state_dict[f"{pre}.ln_2.weight"])
        put(f"{blk}/ln_2/bias", state_dict[f"{pre}.ln_2.bias"])
        wqkv = state_dict[f"{pre}.attn.in_proj_weight"]   # [3w, w]
        bqkv = state_dict[f"{pre}.attn.in_proj_bias"]
        hd = width // heads
        for j, nm in enumerate(("query", "key", "value")):
            w = wqkv[j * width:(j + 1) * width].T          # [w, w] in->out
            b = bqkv[j * width:(j + 1) * width]
            put(f"{blk}/attn/{nm}/kernel", w.reshape(width, heads, hd))
            put(f"{blk}/attn/{nm}/bias", b.reshape(heads, hd))
        wo = state_dict[f"{pre}.attn.out_proj.weight"]     # [w, w] out x in
        put(f"{blk}/attn/out/kernel", wo.T.reshape(heads, hd, width))
        put(f"{blk}/attn/out/bias", state_dict[f"{pre}.attn.out_proj.bias"])
        put(f"{blk}/mlp_fc/kernel", state_dict[f"{pre}.mlp.c_fc.weight"].T)
        put(f"{blk}/mlp_fc/bias", state_dict[f"{pre}.mlp.c_fc.bias"])
        put(f"{blk}/mlp_proj/kernel", state_dict[f"{pre}.mlp.c_proj.weight"].T)
        put(f"{blk}/mlp_proj/bias", state_dict[f"{pre}.mlp.c_proj.bias"])
        i += 1
    return {"params": p}


def load_default_text_encoder(weights_path: Optional[str] = None,
                              bpe_path: Optional[str] = None) -> CLIPTextEncoder:
    weights_path = weights_path or os.environ.get("CLIP_TEXT_WEIGHTS", "")
    bpe_path = bpe_path or os.environ.get(
        "CLIP_BPE_PATH", "datasets/metadata/bpe_simple_vocab_16e6.txt.gz")
    if not weights_path or not os.path.exists(weights_path):
        raise FileNotFoundError(
            "CLIP text-encoder weights not available; set CLIP_TEXT_WEIGHTS "
            "to a CLIP checkpoint (.pth) or use precomputed vocabulary "
            "embeddings (datasets/metadata/*.npy)")
    import torch
    sd = torch.load(weights_path, map_location="cpu")
    sd = {k: v.numpy() for k, v in getattr(sd, "state_dict", lambda: sd)().items()} \
        if hasattr(sd, "state_dict") else \
        {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
         for k, v in sd.items()}
    params = convert_clip_text_weights(sd)
    return CLIPTextEncoder(params, bpe_path)
