"""Launch the web GUI shell (reference: gui.py / gui_diff.py / gui_reflow.py
— one family-agnostic shell here; the model family is read from the loaded
checkpoint's config, as in cli/infer.py).

    python -m ddsp_svc_tpu.cli.gui [--port 7860] [--model ckpt.npz]
"""
from __future__ import annotations

import argparse


def main(argv=None, ready_cb=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--model", default=None, help="checkpoint to preload")
    args = p.parse_args(argv)

    from .common import enable_compile_cache

    enable_compile_cache()

    from ..gui.web import GuiApp, serve

    app = GuiApp()
    if args.model:
        app.load_model(args.model)
    serve(app, host=args.host, port=args.port, ready_cb=ready_cb)


if __name__ == "__main__":
    main()
