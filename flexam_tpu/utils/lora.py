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
    # group per (module, proj): update the stacked [L, out, in] weight
    by_mod: Dict[Tuple, Dict[int, np.ndarray]] = {}
    for (_, layer, mod, proj), d in deltas.items():
        by_mod.setdefault((mod, proj), {})[layer] = d
    for (mod, proj), layer_deltas in by_mod.items():
        w = blocks[mod][proj]["weight"]
        full = np.zeros(w.shape, np.float32)
        for layer, d in layer_deltas.items():
            full[layer] = d
        neww = (w.astype(jnp.float32) + jnp.asarray(full)).astype(w.dtype)
        blocks = {**blocks, mod: {**blocks[mod],
                                  proj: {**blocks[mod][proj],
                                         "weight": neww}}}
    return {**out, "blocks": blocks}


def unmerge_lora(params: dict, lora_sd, multiplier: float = 1.0) -> dict:
    return merge_lora(params, lora_sd, multiplier, sign=-1.0)
