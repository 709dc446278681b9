"""Monocular tracking CLI (vhap/track.py equivalent).

Usage:
    python -m vhap_tpu.track --data.root_folder <dir> --data.sequence <name> \
        [--model.no-use-static-offset] [--w.reg_tex_tv 1e4] ...
"""

from vhap_tpu.config.base import BaseTrackingConfig
from vhap_tpu.config.cli import parse_cli, to_yaml


def main():
    cfg = parse_cli(BaseTrackingConfig)
    print(to_yaml(cfg))
    from vhap_tpu.tracker.tracker import GlobalTracker
    tracker = GlobalTracker(cfg)
    tracker.optimize(resume_state_path=cfg.exp.resume_run_state)


if __name__ == "__main__":
    main()
