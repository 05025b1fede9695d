"""Per-device task-parallel eval sharding.

Counterpart of /root/reference/hear-eval-kit/heareval/multigpu.py:14-34 (read
shell commands from stdin, Pool(num_gpus), pin each worker via
CUDA_VISIBLE_DEVICES). The TPU analog pins workers to chips with
TPU_VISIBLE_CHIPS (and keeps CUDA_VISIBLE_DEVICES for GPU hosts), so N
independent eval commands run one-per-chip:

    ls -d embeddings/*/ | sed 's|^|python -m wavjepa_tpu.eval predictions |' \\
        | python -m wavjepa_tpu.eval.multidevice --num-devices 4
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor
from typing import List


def run_command(command: str, device_id: int) -> int:
    env = dict(os.environ)
    env["TPU_VISIBLE_CHIPS"] = str(device_id)
    env["CUDA_VISIBLE_DEVICES"] = str(device_id)
    print(f"[device {device_id}] {command}", flush=True)
    return subprocess.call(command, shell=True, env=env)


def run_commands(commands: List[str], num_devices: int) -> List[int]:
    """Round-robin commands over a per-device worker pool."""
    results: List[int] = [0] * len(commands)

    def worker(idx_cmd):
        idx, cmd = idx_cmd
        results[idx] = run_command(cmd, idx % num_devices)

    with ThreadPoolExecutor(max_workers=num_devices) as pool:
        list(pool.map(worker, enumerate(commands)))
    return results


def main(argv=None):
    parser = argparse.ArgumentParser(prog="wavjepa_tpu.eval.multidevice")
    parser.add_argument("--num-devices", type=int, default=0,
                        help="0 = all visible devices")
    args = parser.parse_args(argv)
    n = args.num_devices
    if n <= 0:
        try:
            import jax

            n = jax.local_device_count()
        except Exception:
            n = 1
    commands = [line.strip() for line in sys.stdin if line.strip()]
    codes = run_commands(commands, n)
    return max(codes) if codes else 0


if __name__ == "__main__":
    sys.exit(main())
