"""Demo editing manager (counterpart of /root/reference/demo/manager.py):
flat dotted-key config -> nested dict, component caching keyed on config
equality, edit execution.  UI-framework-agnostic — used by the Gradio app
(demo/run.py) and directly scriptable.
"""

from __future__ import annotations

from typing import Any, Dict, List

from eta_inversion_tpu import load_editor, load_inverter
from eta_inversion_tpu.models import load_diffusion_model
from eta_inversion_tpu.utils.debug_utils import enable_deterministic

enable_deterministic()


def dict_set_deep(dic: Dict[str, Any], key: str, val: Any) -> None:
    keys: List[str] = key.split(".")
    for k in keys[:-1]:
        dic = dic.setdefault(k, {})
    dic[keys[-1]] = val


def to_nested_dict(dic: Dict[str, Any]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, v in dic.items():
        dict_set_deep(out, k, v)
    return out


def dict_equal(dic1, dic2) -> bool:
    if dic1 is None or dic2 is None:
        return False
    return all(k in dic2 and dic2[k] == v for k, v in dic1.items())


# per-method default guidance scales (reference demo/demo_utils.py:183-189)
METHOD_DEFAULTS = {
    "edict": {"guidance_scale_fwd": 3.0, "guidance_scale_bwd": 3.0},
    "ddpminv": {"guidance_scale_fwd": 3.5, "guidance_scale_bwd": 15.0},
    "_default": {"guidance_scale_fwd": 1.0, "guidance_scale_bwd": 7.5},
}


class EditorManager:
    def __init__(self):
        self.model = None
        self.preproc = None
        self.postproc = None
        self.inverter = None
        self.editor = None
        self.cfg: Dict[str, Any] = {}

    def process_ptp_config(self, cfg: Dict[str, Any]) -> Dict[str, Any]:
        methods = cfg["editor"].get("methods", {})
        if "ptp" in methods and "dft_cfg" in methods["ptp"]:
            d = methods["ptp"]["dft_cfg"]
            methods["ptp"]["dft_cfg"] = {
                "is_replace_controller": d.get("is_replace_controller", False),
                "cross_replace_steps": {"default_": d.get("cross_replace_steps", 0.4)},
                "self_replace_steps": d.get("self_replace_steps", 0.6),
                "blend_words": ((d["source_blend_word"],), (d["target_blend_word"],))
                if d.get("source_blend_word") else None,
                "equilizer_params": {"words": (d["eq_params_words"],),
                                     "values": (d["eq_params_values"],)}
                if d.get("eq_params_words") else None,
            }
        return cfg

    def run(self, cfg: Dict[str, Any]) -> Dict[str, Any]:
        cfg = to_nested_dict(cfg)
        cfg = self.process_ptp_config(cfg)

        for key in ("inverter", "editor"):
            methods = cfg[key].pop("methods", {})
            cfg[key].update(methods.get(cfg[key]["type"], {}))

        source_image = cfg["editor"].pop("source_image")
        source_prompt = cfg["editor"].pop("source_prompt")
        target_prompt = cfg["editor"].pop("target_prompt")

        if not dict_equal(cfg["model"], self.cfg.get("model")):
            self.model, (self.preproc, self.postproc) = load_diffusion_model(
                **cfg["model"])
            self.cfg["inverter"] = None
        if not dict_equal(cfg["inverter"], self.cfg.get("inverter")):
            inv_cfg = dict(cfg["inverter"])
            self.inverter = load_inverter(self.model, inv_cfg.pop("type"), **inv_cfg)
            self.cfg["editor"] = None
        if not dict_equal(cfg["editor"], self.cfg.get("editor")):
            ed_cfg = dict(cfg["editor"])
            self.editor = load_editor(self.inverter, ed_cfg.pop("type"), **ed_cfg)

        widx = next((i for i, (s, t) in enumerate(
            zip(source_prompt.split(" "), target_prompt.split(" "))) if s != t), None)
        inv_cfg = dict(edit_word_idx=(widx, widx))

        image = self.preproc(source_image)
        edit_res = self.editor.edit(image, source_prompt, target_prompt,
                                    inv_cfg=inv_cfg)
        self.cfg = cfg
        if edit_res is None:
            return {"edit_image": None,
                    "error": "inverter/editor combination unsupported"}
        return {"edit_image": self.postproc(edit_res["image"])}
