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
    """Run commands over a pool of exclusive devices: each worker checks a
    device id out of a free-list for the duration of its command, so two
    concurrent commands never share a chip (TPUs are exclusive-access; a
    static idx % num_devices mapping double-books a chip whenever runtimes
    are uneven)."""
    import queue as _queue

    results: List[int] = [0] * len(commands)
    free: _queue.Queue = _queue.Queue()
    for device in range(num_devices):
        free.put(device)

    def worker(idx_cmd):
        idx, cmd = idx_cmd
        device = free.get()
        try:
            results[idx] = run_command(cmd, device)
        finally:
            free.put(device)

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
