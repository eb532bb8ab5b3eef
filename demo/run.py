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
            "gradio is not installed in this environment. The demo UI requires "
            "it; the editing backend (demo/manager.py EditorManager) works "
            "without gradio — see demo/demo_utils.py build_app for the UI "
            "definition.")
    from demo.demo_utils import build_app

    app = build_app()
    app.launch(server_name="127.0.0.1", server_port=7860)


if __name__ == "__main__":
    main()
