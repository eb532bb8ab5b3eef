"""Gradio demo launcher (counterpart of /root/reference/demo/run.py).

Gradio is not bundled in this offline image; the app builds and launches only
when gradio is importable (the manager in demo/manager.py works without it).
"""

from __future__ import annotations


def main():
    try:
        import gradio  # noqa: F401
    except ImportError:
        raise SystemExit(
            "gradio is not installed in this environment — run the "
            "dependency-free web demo instead:  python demo/web.py "
            "(same EditorManager backend, stdlib http.server UI).")
    from demo.demo_utils import build_app

    app = build_app()
    app.launch(server_name="127.0.0.1", server_port=7860)


if __name__ == "__main__":
    main()
