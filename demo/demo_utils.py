"""Gradio UI definition (counterpart of /root/reference/demo/demo_utils.py):
model/inverter/editor dropdowns with per-method option groups and per-method
default guidance scales; config keys are flat dotted paths consumed by
EditorManager.
"""

from __future__ import annotations

from eta_inversion_tpu import get_edit_methods, get_inversion_methods

from .manager import METHOD_DEFAULTS, EditorManager


def method_defaults(inv_method: str):
    return METHOD_DEFAULTS.get(inv_method, METHOD_DEFAULTS["_default"])


def build_app():
    import gradio as gr

    manager = EditorManager()

    def run_edit(image, source_prompt, target_prompt, model, steps, inv_method,
                 gs_fwd, gs_bwd, edit_method, is_replace, cross_steps, self_steps,
                 src_blend, tgt_blend, eq_word, eq_value, eta_start, eta_end,
                 noise_samples):
        cfg = {
            "model.model": model,
            "inverter.type": inv_method,
            "inverter.num_inference_steps": int(steps),
            "inverter.guidance_scale_fwd": gs_fwd,
            "inverter.guidance_scale_bwd": gs_bwd,
            "editor.type": edit_method,
            "editor.source_image": image,
            "editor.source_prompt": source_prompt,
            "editor.target_prompt": target_prompt,
        }
        if inv_method == "etainv":
            cfg["inverter.methods.etainv.eta_start"] = eta_start
            cfg["inverter.methods.etainv.eta_end"] = eta_end
            cfg["inverter.methods.etainv.noise_sample_count"] = int(noise_samples)
        if edit_method == "ptp":
            cfg.update({
                "editor.methods.ptp.dft_cfg.is_replace_controller": is_replace,
                "editor.methods.ptp.dft_cfg.cross_replace_steps": cross_steps,
                "editor.methods.ptp.dft_cfg.self_replace_steps": self_steps,
                "editor.methods.ptp.dft_cfg.source_blend_word": src_blend or None,
                "editor.methods.ptp.dft_cfg.target_blend_word": tgt_blend or None,
                "editor.methods.ptp.dft_cfg.eq_params_words": eq_word or None,
                "editor.methods.ptp.dft_cfg.eq_params_values": eq_value,
            })
        out = manager.run(cfg)
        return out.get("edit_image"), out.get("error", "")

    def on_method_change(inv_method):
        d = method_defaults(inv_method)
        return d["guidance_scale_fwd"], d["guidance_scale_bwd"]

    with gr.Blocks(title="eta-inversion-tpu demo") as app:
        gr.Markdown("## Real-image editing (TPU) — inversion + attention editing")
        with gr.Row():
            with gr.Column():
                image = gr.Image(label="Source image")
                source_prompt = gr.Textbox(label="Source prompt")
                target_prompt = gr.Textbox(label="Target prompt")
                model = gr.Dropdown(["sd15", "sd21", "sd21v", "sdxl", "tiny", "tiny21", "tinyxl", "tinyv"], value="sd15", label="Model")
                steps = gr.Slider(1, 100, value=50, step=1, label="Steps")
                inv_method = gr.Dropdown(get_inversion_methods(), value="etainv",
                                         label="Inversion method")
                gs_fwd = gr.Number(value=1.0, label="Forward guidance")
                gs_bwd = gr.Number(value=7.5, label="Backward guidance")
                edit_method = gr.Dropdown(get_edit_methods(), value="ptp",
                                          label="Editing method")
                with gr.Accordion("prompt-to-prompt options", open=False):
                    is_replace = gr.Checkbox(value=False, label="Replace controller")
                    cross_steps = gr.Slider(0, 1, value=0.4, label="Cross-replace steps")
                    self_steps = gr.Slider(0, 1, value=0.6, label="Self-replace steps")
                    src_blend = gr.Textbox(label="Source blend word")
                    tgt_blend = gr.Textbox(label="Target blend word")
                    eq_word = gr.Textbox(label="Equalizer word")
                    eq_value = gr.Number(value=2.0, label="Equalizer value")
                with gr.Accordion("eta-inversion options", open=False):
                    eta_start = gr.Number(value=0.0, label="Eta start")
                    eta_end = gr.Number(value=0.4, label="Eta end")
                    noise_samples = gr.Slider(1, 20, value=10, step=1,
                                              label="Noise sample count")
                btn = gr.Button("Edit")
            with gr.Column():
                out_img = gr.Image(label="Edited image")
                err = gr.Textbox(label="Status", interactive=False)
        inv_method.change(on_method_change, [inv_method], [gs_fwd, gs_bwd])
        btn.click(run_edit,
                  [image, source_prompt, target_prompt, model, steps, inv_method,
                   gs_fwd, gs_bwd, edit_method, is_replace, cross_steps, self_steps,
                   src_blend, tgt_blend, eq_word, eq_value, eta_start, eta_end,
                   noise_samples],
                  [out_img, err])
    return app
