"""Pretrained-parameter transfer between model variants.

Pure param-pytree surgery replacing the reference's `load_pretrained`
deepcopy polymorphism (weatherbert.py:58-82, weatherformer.py:44-58,
weatherformer_sinusoid.py:52-64, weatherformer_mixture.py:66-80):

* the encoder trunk ('core': in_proj + transformer) always transfers;
* 'out_proj' transfers only when shapes match (WeatherFormer <- WeatherBERT
  drops it: 2*F vs F head) and load_out_proj=True;
* prior parameters (frequency/phase/amplitude/log_var_*/mixture_logits)
  transfer when both trees have them with matching shapes (k mismatch
  raises, mirroring the reference's k check).

Also provides `convert_torch_checkpoint`: reference .pth state_dict ->
our param pytree (the "pretrained checkpoints transfer bit-compatibly"
requirement, BASELINE.json).
"""

import logging
from typing import Any, Dict

import jax
import numpy as np

logger = logging.getLogger(__name__)

PRIOR_PARAM_NAMES = (
    "frequency", "phase", "amplitude", "log_var_prior", "log_var_k",
    "mixture_logits",
)


def _tree(params) -> Dict:
    return params["params"] if "params" in params else params


def has_moe_layers(params) -> bool:
    """True if the param pytree contains MoE expert layers (models/moe.py,
    a 'moe' submodule inside any encoder layer)."""
    found = []

    def walk(node):
        if isinstance(node, dict):
            for key, val in node.items():
                if key == "moe":
                    found.append(True)
                walk(val)

    walk(_tree(params))
    return bool(found)


def load_pretrained(model_name: str, target_params, pretrained_params,
                    load_out_proj: bool = True):
    """Returns target_params with transferable subtrees replaced by the
    pretrained values."""
    tgt = dict(_tree(target_params))
    src = _tree(pretrained_params)

    if "core" not in src or "core" not in tgt:
        raise ValueError("both param trees must contain a 'core' trunk")
    tgt_in = tgt["core"]["in_proj"]["kernel"].shape
    src_in = src["core"]["in_proj"]["kernel"].shape
    if tgt_in != src_in:
        raise ValueError(
            f"expected input dimension {tgt_in} but received {src_in}"
        )

    if has_moe_layers(src["core"]) != has_moe_layers(tgt["core"]):
        raise ValueError(
            "FFN architecture mismatch: one checkpoint uses MoE layers "
            "(--moe-experts) and the other a dense FFN; build the target "
            "with the same num_experts as the pretrained encoder"
        )
    tgt["core"] = src["core"]

    def shapes_match(a, b):
        sa = jax.tree.leaves(a)
        sb = jax.tree.leaves(b)
        return len(sa) == len(sb) and all(
            x.shape == y.shape for x, y in zip(sa, sb)
        )

    if "out_proj" in src and "out_proj" in tgt:
        if load_out_proj and shapes_match(src["out_proj"], tgt["out_proj"]):
            logger.info("Loading out_proj from pretrained model")
            tgt["out_proj"] = src["out_proj"]
        else:
            logger.info("Not loading out_proj from pretrained model")

    for name in PRIOR_PARAM_NAMES:
        if name in src and name in tgt:
            if np.shape(src[name]) != np.shape(tgt[name]):
                raise ValueError(
                    f"{name} shape mismatch: {np.shape(tgt[name])} != "
                    f"{np.shape(src[name])} (k mismatch?)"
                )
            tgt[name] = src[name]

    return {"params": tgt} if "params" in target_params else tgt


# ---------------------------------------------------------------------------
# Reference (torch) checkpoint conversion
# ---------------------------------------------------------------------------

def convert_torch_state_dict(state_dict, num_layers: int) -> Dict[str, Any]:
    """Map a reference WeatherBERT/WeatherFormer state_dict to our param
    tree. torch Linear weights are [out, in] -> transposed to [in, out]."""

    def t(name):
        return np.ascontiguousarray(
            np.asarray(state_dict[name].detach().cpu().numpy()).T
        )

    def v(name):
        return np.asarray(state_dict[name].detach().cpu().numpy())

    core: Dict[str, Any] = {
        "in_proj": {"kernel": t("in_proj.weight"), "bias": v("in_proj.bias")},
        "encoder": {},
    }
    for i in range(num_layers):
        p = f"transformer_encoder.layers.{i}."
        core["encoder"][f"layer_{i}"] = {
            "self_attn": {
                "qkv_proj": {
                    "kernel": t(p + "self_attn.in_proj_weight"),
                    "bias": v(p + "self_attn.in_proj_bias"),
                },
                "out_proj": {
                    "kernel": t(p + "self_attn.out_proj.weight"),
                    "bias": v(p + "self_attn.out_proj.bias"),
                },
            },
            "linear1": {"kernel": t(p + "linear1.weight"),
                        "bias": v(p + "linear1.bias")},
            "linear2": {"kernel": t(p + "linear2.weight"),
                        "bias": v(p + "linear2.bias")},
            "norm1": {"scale": v(p + "norm1.weight"),
                      "bias": v(p + "norm1.bias")},
            "norm2": {"scale": v(p + "norm2.weight"),
                      "bias": v(p + "norm2.bias")},
        }
    params: Dict[str, Any] = {"core": core}
    if "out_proj.weight" in state_dict:
        params["out_proj"] = {"kernel": t("out_proj.weight"),
                              "bias": v("out_proj.bias")}
    for name in PRIOR_PARAM_NAMES:
        if name in state_dict:
            params[name] = v(name)
    return {"params": params}


def convert_torch_checkpoint(path: str, num_layers: int) -> Dict[str, Any]:
    """Load a reference whole-model pickle or checkpoint dict and convert.
    (reference saves whole nn.Module pickles AND state-dict checkpoints,
    base_trainer.py:127-146)."""
    import torch

    obj = torch.load(path, weights_only=False, map_location="cpu")
    if hasattr(obj, "state_dict"):
        state_dict = obj.state_dict()
    elif isinstance(obj, dict) and "model_state_dict" in obj:
        state_dict = obj["model_state_dict"]
    else:
        state_dict = obj
    # strip DDP 'module.' prefixes if present
    state_dict = { (k[7:] if k.startswith("module.") else k): v
                   for k, v in state_dict.items() }
    return convert_torch_state_dict(state_dict, num_layers)
