"""``python -m fabric_tpu.cli.train --config metadata.json [--key value ...]``

The reference entry point is ``python train.py`` driven solely by
metadata.json (polyaxonfile.yml:9); this CLI accepts the same JSON plus real
per-key overrides (see fabric_tpu/config.py).
"""

from __future__ import annotations

import logging
import sys


def main(argv=None) -> int:
    from fabric_tpu.config import load_config
    from fabric_tpu.parallel.distributed import maybe_initialize
    from fabric_tpu.train.loop import train

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    maybe_initialize()  # no-op on single-host; pods auto-discover topology
    cfg = load_config(argv=sys.argv[1:] if argv is None else argv)
    _, history = train(cfg)
    if history.get("status") == "preempted":
        # clean exit: the mid-epoch checkpoint is on disk; rerunning this
        # command with --resume <weight_dir> completes the run exactly
        logging.getLogger("fabric_tpu").warning(
            "run preempted — relaunch with --resume %s", cfg.weight_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
