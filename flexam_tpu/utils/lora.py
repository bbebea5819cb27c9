"""LoRA hot-merge into DiT weights.

Behavioral reference: `FlexAM/utils/lora_utils.py` (`merge_lora` :371-491,
`unmerge_lora` :493-): kohya/diffusers-style key remap, merges
W += multiplier * scale * (B @ A) into the base weights; unmerge subtracts.
The ComfyUI layer keeps a CPU state-dict cache for fast swaps
(`wan2_2_fun_flexam/nodes.py:595-649`) — here merge/unmerge are pure
pytree transforms, so "swap" is just keeping the base pytree around.
"""

from __future__ import annotations

import re
from typing import Dict, Mapping, Optional, Tuple

import numpy as np


def _collect_lora_pairs(lora_sd: Mapping[str, np.ndarray]):
    """Group {stem: (down/A, up/B, alpha)} from kohya ('lora_unet_*',
    `lora_utils.py:380-420`) or diffusers ('*.lora_A.weight') layouts."""
    pairs: Dict[str, dict] = {}
    for k, v in lora_sd.items():
        if k.endswith(".alpha"):
            pairs.setdefault(k[:-len(".alpha")], {})["alpha"] = float(
                np.asarray(v))
        elif ".lora_down.weight" in k:
            pairs.setdefault(k.split(".lora_down.")[0], {})["down"] = v
        elif ".lora_up.weight" in k:
            pairs.setdefault(k.split(".lora_up.")[0], {})["up"] = v
        elif ".lora_A.weight" in k:
            pairs.setdefault(k.split(".lora_A.")[0], {})["down"] = v
        elif ".lora_B.weight" in k:
            pairs.setdefault(k.split(".lora_B.")[0], {})["up"] = v
    return {k: p for k, p in pairs.items() if "down" in p and "up" in p}


def _stem_to_path(stem: str) -> Optional[Tuple]:
    """kohya/diffusers stem -> flexam_tpu DiT pytree path.

    'lora_unet_blocks_3_self_attn_q' / 'blocks.3.self_attn.q'
      -> ("blocks", 3, "self_attn", "q")
    'blocks.3.ffn.0' -> ("blocks", 3, "ffn", "fc1")
    """
    s = stem
    if s.startswith("lora_unet_"):
        s = s[len("lora_unet_"):].replace("_", ".")
        # undo over-splitting of known tokens
        s = s.replace("self.attn", "self_attn").replace(
            "cross.attn", "cross_attn")
    m = re.match(r"blocks\.(\d+)\.(self_attn|cross_attn)\.([qkvo])$", s)
    if m:
        return ("blocks", int(m.group(1)), m.group(2), m.group(3))
    m = re.match(r"blocks\.(\d+)\.ffn\.([02])$", s)
    if m:
        return ("blocks", int(m.group(1)), "ffn",
                "fc1" if m.group(2) == "0" else "fc2")
    return None


def merge_lora(params: dict, lora_sd: Mapping[str, np.ndarray],
               multiplier: float = 1.0, sign: float = 1.0) -> dict:
    """Return params with LoRA deltas merged into the scan-stacked block
    weights. `sign=-1` unmerges (`unmerge_lora`, `lora_utils.py:493`)."""
    import jax.numpy as jnp

    pairs = _collect_lora_pairs(lora_sd)
    deltas: Dict[Tuple, np.ndarray] = {}
    skipped = 0
    for stem, p in pairs.items():
        path = _stem_to_path(stem)
        if path is None:
            skipped += 1
            continue
        down = np.asarray(p["down"], np.float32)    # [r, in]
        up = np.asarray(p["up"], np.float32)        # [out, r]
        rank = down.shape[0]
        alpha = p.get("alpha", float(rank))
        scale = alpha / rank
        deltas[path] = sign * multiplier * scale * (up @ down)
    if skipped:
        print(f"merge_lora: {skipped} keys did not map and were skipped")

    out = params
    blocks = dict(params["blocks"])
    # group per (module, proj): update the stacked [L, out, in] weight.
    # Only the touched layers' deltas cross host->device (a full-shape
    # zero tensor for a 5B ffn would be GBs over the slow link).
    by_mod: Dict[Tuple, Dict[int, np.ndarray]] = {}
    for (_, layer, mod, proj), d in deltas.items():
        by_mod.setdefault((mod, proj), {})[layer] = d
    for (mod, proj), layer_deltas in by_mod.items():
        w = blocks[mod][proj]["weight"]
        layers = sorted(layer_deltas)
        idx = jnp.asarray(layers)
        stack = jnp.asarray(
            np.stack([layer_deltas[i] for i in layers], dtype=np.float32))
        # fp32 add on device per touched layer, cast back — same numerics
        # as the old full-tensor path, but only the deltas leave the host
        upd = (w[idx].astype(jnp.float32) + stack).astype(w.dtype)
        neww = w.at[idx].set(upd)
        blocks = {**blocks, mod: {**blocks[mod],
                                  proj: {**blocks[mod][proj],
                                         "weight": neww}}}
    return {**out, "blocks": blocks}


def unmerge_lora(params: dict, lora_sd, multiplier: float = 1.0) -> dict:
    return merge_lora(params, lora_sd, multiplier, sign=-1.0)


# ---------------------------------------------------------------------------
# train-side LoRA (`LoRANetwork`, `lora_utils.py:158-370`)
# ---------------------------------------------------------------------------

_PROJ_NAMES = {"self_attn": ("q", "k", "v", "o"),
               "cross_attn": ("q", "k", "v", "o"),
               "ffn": ("fc1", "fc2")}


def init_lora_params(key, dit_params: dict, rank: int = 16,
                     alpha: Optional[float] = None,
                     targets=("self_attn", "cross_attn", "ffn")) -> dict:
    """Create trainable LoRA factors over the DiT's scan-stacked block
    linears — the `LoRANetwork` creation the reference inherits from
    kohya (`lora_utils.py:158-370`), as a pytree:

      {"blocks": {mod: {proj: {"a": [L, r, in], "b": [L, out, r]}}},
       "rank": r, "alpha": a}

    A is Kaiming-ish normal, B zero (standard LoRA init: the delta starts
    at exactly zero), alpha defaults to rank (scale 1)."""
    import jax
    import jax.numpy as jnp

    blocks = dit_params["blocks"]
    out: Dict = {"blocks": {}, "rank": rank,
                 "alpha": float(alpha if alpha is not None else rank)}
    for mod in targets:
        if mod not in blocks:
            continue
        out["blocks"][mod] = {}
        for proj in _PROJ_NAMES[mod]:
            if proj not in blocks[mod]:
                continue
            w = blocks[mod][proj]["weight"]           # [L, out, in]
            layers, odim, idim = w.shape
            key, k1 = jax.random.split(key)
            a = jax.random.normal(k1, (layers, rank, idim),
                                  jnp.float32) / rank
            b = jnp.zeros((layers, odim, rank), jnp.float32)
            out["blocks"][mod][proj] = {"a": a, "b": b}
    return out


def apply_lora(dit_params: dict, lora: dict, multiplier: float = 1.0
               ) -> dict:
    """In-jit effective weights: W_eff = W + m*(alpha/r)*(B @ A) per
    stacked layer. Differentiable through (a, b) — the LoRA train step
    freezes the base and takes grads through this."""
    import jax.numpy as jnp

    scale = multiplier * lora["alpha"] / lora["rank"]
    blocks = dict(dit_params["blocks"])
    for mod, projs in lora["blocks"].items():
        newmod = dict(blocks[mod])
        for proj, ab in projs.items():
            w = newmod[proj]["weight"]
            delta = jnp.einsum("lor,lri->loi", ab["b"], ab["a"]) * scale
            neww = (w.astype(jnp.float32) + delta).astype(w.dtype)
            newmod[proj] = {**newmod[proj], "weight": neww}
        blocks[mod] = newmod
    return {**dit_params, "blocks": blocks}


def lora_to_state_dict(lora: dict, layout: str = "kohya") -> Dict[str, "np.ndarray"]:
    """Export trained factors to the checkpoint layouts `merge_lora`
    loads (kohya 'lora_unet_*' or diffusers '*.lora_A/B'), per stacked
    layer — so a LoRA trained here hot-merges anywhere."""
    sd: Dict[str, np.ndarray] = {}
    alpha = np.float32(lora["alpha"])
    for mod, projs in lora["blocks"].items():
        for proj, ab in projs.items():
            a = np.asarray(ab["a"], np.float32)
            b = np.asarray(ab["b"], np.float32)
            ref_proj = "0" if proj == "fc1" else ("2" if proj == "fc2"
                                                  else proj)
            for layer in range(a.shape[0]):
                if layout == "kohya":
                    stem = f"lora_unet_blocks_{layer}_{mod}_{ref_proj}"
                    sd[f"{stem}.lora_down.weight"] = a[layer]
                    sd[f"{stem}.lora_up.weight"] = b[layer]
                    sd[f"{stem}.alpha"] = alpha
                else:
                    stem = f"blocks.{layer}.{mod}.{ref_proj}"
                    sd[f"{stem}.lora_A.weight"] = a[layer]
                    sd[f"{stem}.lora_B.weight"] = b[layer]
                    sd[f"{stem}.alpha"] = alpha
    return sd
