"""Parameter interop with the reference's torch ``state_dict`` layout.

The reference checkpoints are bare ``state_dict`` pickles
(reference train.py:84-90). These converters map between our param pytree
and that exact key/layout space (module names from reference
models.py:133-167 and modules.py:124-165: ``backbone.net.conv_<i>``,
``box_network.body.dense<i>`` / ``.output_layers.<j>``,
``object_encoder.dense<i>`` / ``.out``, ``virtual_edge_element``, ...), so

  * a reference user can load their trained weights into this framework
    (``from_torch_state_dict`` + torch.load), and
  * our checkpoints can be exported for the reference implementation
    (``to_torch_state_dict`` + torch.save).

Layout transforms: torch Conv2d weights are OIHW vs our HWIO; torch Linear
weights are (out, in) vs our (in, out). Pure numpy — torch itself is only
needed by the caller to (de)serialize the pickle.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _linear_out(prefix: str, layer, out: Dict[str, np.ndarray]):
    out[f"{prefix}.weight"] = np.asarray(layer["w"]).T.copy()
    out[f"{prefix}.bias"] = np.asarray(layer["b"]).copy()


def _mlp_out(name: str, params, multi: bool, out: Dict[str, np.ndarray]):
    body = f"{name}.body" if multi else name
    for i, layer in enumerate(params["trunk"]):
        _linear_out(f"{body}.dense{i}", layer, out)
    if multi:
        for j, head in enumerate(params["heads"]):
            _linear_out(f"{name}.output_layers.{j}", head, out)
    else:
        _linear_out(f"{name}.out", params["heads"][0], out)


_MLPS = (  # (state_dict name, our name, multi-head?)
    ("box_network", "box_net", True),
    ("object_encoder", "object_encoder", False),
    ("z_network", "z_net", True),
    ("obj_network", "obj_net", False),
    ("object_decoder", "object_decoder", False),
)


def to_torch_state_dict(params) -> Dict[str, np.ndarray]:
    """Our param pytree -> {reference state_dict key: numpy array}."""
    out: Dict[str, np.ndarray] = {}
    layers = params["backbone"]["layers"]
    for i, layer in enumerate(layers):
        name = f"conv_{i}" if i < len(layers) - 1 else "conv_out"
        out[f"backbone.net.{name}.weight"] = np.asarray(
            layer["w"]).transpose(3, 2, 0, 1).copy()
        out[f"backbone.net.{name}.bias"] = np.asarray(layer["b"]).copy()
    for sd_name, our_name, multi in _MLPS:
        _mlp_out(sd_name, params[our_name], multi, out)
    out["virtual_edge_element"] = np.asarray(params["edge"]).copy()
    return out


def _linear_in(prefix: str, layer, sd):
    layer["w"] = np.ascontiguousarray(np.asarray(sd[f"{prefix}.weight"]).T)
    layer["b"] = np.asarray(sd[f"{prefix}.bias"]).copy()


def from_torch_state_dict(sd: Dict, params) -> Dict:
    """Reference state_dict -> param pytree shaped like ``params``.

    ``params`` supplies the structure (from init_params); values are
    replaced. Tensor-like values in ``sd`` are converted via np.asarray, so
    a raw torch state_dict works directly. Unknown reference keys (the
    discarded Self_Attn's ``attn.*``, reference models.py:167) are ignored."""
    import jax

    params = jax.tree_util.tree_map(np.asarray, params)
    layers = params["backbone"]["layers"]
    sd = {k: np.asarray(v) for k, v in sd.items()}
    for i, layer in enumerate(layers):
        name = f"conv_{i}" if i < len(layers) - 1 else "conv_out"
        layer["w"] = np.ascontiguousarray(
            sd[f"backbone.net.{name}.weight"].transpose(2, 3, 1, 0))
        layer["b"] = sd[f"backbone.net.{name}.bias"].copy()
    for sd_name, our_name, multi in _MLPS:
        p = params[our_name]
        body = f"{sd_name}.body" if multi else sd_name
        for i, layer in enumerate(p["trunk"]):
            _linear_in(f"{body}.dense{i}", layer, sd)
        if multi:
            for j, head in enumerate(p["heads"]):
                _linear_in(f"{sd_name}.output_layers.{j}", head, sd)
        else:
            _linear_in(f"{sd_name}.out", p["heads"][0], sd)
    params["edge"] = sd["virtual_edge_element"].copy()
    import jax.numpy as jnp
    return jax.tree_util.tree_map(jnp.asarray, params)
