"""NeRSemble multiview tracking CLI (vhap/track_nersemble.py equivalent)."""

from vhap_tpu.config.cli import parse_cli, to_yaml
from vhap_tpu.config.nersemble import NersembleTrackingConfig


def main():
    cfg = parse_cli(NersembleTrackingConfig)
    print(to_yaml(cfg))
    from vhap_tpu.tracker.tracker import GlobalTracker
    tracker = GlobalTracker(cfg)
    tracker.optimize(resume_state_path=cfg.exp.resume_run_state)


if __name__ == "__main__":
    main()
