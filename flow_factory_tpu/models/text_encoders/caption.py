"""LM caption upsampling: prompt rewriting with the bundled decoder.

The reference's FLUX.2 pipeline upsamples short user prompts through its
VLM text encoder before embedding (caption upsampling); LTX-2 has an
analogous LLM prompt-enhancement step. This module implements that with the
SAME ``LMEncoder`` the adapter already carries for conditioning — logits
come from the tied token embedding (``Embed.attend``), so generation adds no
parameters.

Decode is greedy over a fixed padded length: each step re-runs the causal
forward and scatters the argmax token at the per-sample cursor (a
``lax.scan`` with static shapes — one compile, O(steps·L²) attention; fine
for short rewrites, a KV cache is a later optimization). Stop handling and
detokenization happen on host via the adapter's tokenizer.
"""
from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnums=(0, 4))
def _greedy_generate(apply_fn, params, ids, cursor, steps):
    """ids: (B, L) padded; cursor: (B,) first free slot. Returns filled ids."""

    def body(carry, _):
        ids, cur = carry
        _, logits = apply_fn({"params": params}, ids, return_logits=True)
        b = jnp.arange(ids.shape[0])
        nxt = jnp.argmax(logits[b, cur - 1], axis=-1).astype(ids.dtype)
        in_range = cur < ids.shape[1]
        ids = ids.at[b, jnp.minimum(cur, ids.shape[1] - 1)].set(
            jnp.where(in_range, nxt, ids[b, -1])
        )
        return (ids, jnp.where(in_range, cur + 1, cur)), None

    (ids, _), _ = jax.lax.scan(body, (ids, cursor), None, length=steps)
    return ids


class LMCaptionUpsampler:
    """Greedy prompt rewriter over an ``LMEncoder`` + tokenizer pair.

    ``template`` wraps the user prompt into an instruction (reference uses
    the VLM's chat template); the generated continuation becomes the new
    prompt. With the offline ``HashTokenizer`` the output is a deterministic
    id transcript — the full pipeline stays runnable without assets.
    """

    def __init__(
        self,
        module,
        params,
        tokenizer,
        template: str = "Rewrite as a detailed image description: {prompt}\n",
        max_new_tokens: int = 24,
        max_length: int = 96,
    ):
        self.module = module
        self.params = params
        self.tokenizer = tokenizer
        self.template = template
        self.max_new_tokens = int(max_new_tokens)
        self.max_length = int(max_length)

    def __call__(self, prompts: Sequence[str]) -> List[str]:
        texts = [self.template.format(prompt=p) for p in prompts]
        enc = self.tokenizer(
            texts, max_length=self.max_length, padding="max_length",
            truncation=True, return_tensors="np",
        )
        ids = np.asarray(enc["input_ids"], np.int32)
        mask = np.asarray(enc["attention_mask"], np.int32)
        cursor = mask.sum(axis=1).astype(np.int32)  # first pad slot
        out = np.asarray(
            _greedy_generate(
                self.module.apply, self.params, jnp.asarray(ids),
                jnp.asarray(cursor), self.max_new_tokens,
            )
        )
        eos = getattr(self.tokenizer, "eos_token_id", None)
        results: List[str] = []
        for row, start, orig in zip(out, cursor, prompts):
            gen = row[int(start): int(start) + self.max_new_tokens]
            if eos is not None and (gen == eos).any():
                gen = gen[: int(np.argmax(gen == eos))]
            if len(gen) == 0:
                results.append(orig)
                continue
            text = self.tokenizer.batch_decode([gen], skip_special_tokens=True)[0]
            results.append(text.strip() or orig)
        return results
