"""NeRSemble v2 multiview tracking CLI (vhap/track_nersemble_v2.py equivalent)."""

from vhap_tpu.config.cli import parse_cli, to_yaml
from vhap_tpu.config.nersemble_v2 import NersembleV2TrackingConfig


def main():
    cfg = parse_cli(NersembleV2TrackingConfig)
    print(to_yaml(cfg))
    from vhap_tpu.tracker.tracker import GlobalTracker
    tracker = GlobalTracker(cfg)
    tracker.optimize(resume_state_path=cfg.exp.resume_run_state)


if __name__ == "__main__":
    main()
