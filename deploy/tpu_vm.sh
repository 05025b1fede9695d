#!/bin/bash
# TPU-VM provisioning + run launcher — the TPU-native counterpart of the
# reference's spotty GCP workflow (/root/reference/hear-eval-kit/
# spotty.yaml.tmpl + README.spotty.md: preemptible GPU VM, code sync,
# containerized run). On Cloud TPU the accelerator IS the VM, so instead of
# spotty's instance+container indirection this drives `gcloud compute tpus
# tpu-vm` directly: create (optionally preemptible/spot), sync the repo,
# install, and exec commands on all workers of a pod slice.
#
# Usage:
#   deploy/tpu_vm.sh create   NAME [--spot]        # v5e slice, default 8 chips
#   deploy/tpu_vm.sh sync     NAME                 # rsync this repo to all workers
#   deploy/tpu_vm.sh setup    NAME                 # pip install -e . on all workers
#   deploy/tpu_vm.sh train    NAME [train args...] # multi-host SSL pretrain
#   deploy/tpu_vm.sh exec     NAME -- CMD...       # arbitrary command, all workers
#   deploy/tpu_vm.sh delete   NAME
#
# Env: ZONE (default us-west4-a), ACCEL (default v5litepod-8),
#      VERSION (default v2-alpha-tpuv5-lite), PROJECT (gcloud default).
set -euo pipefail

ZONE="${ZONE:-us-west4-a}"
ACCEL="${ACCEL:-v5litepod-8}"
VERSION="${VERSION:-v2-alpha-tpuv5-lite}"
REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"

cmd="${1:?usage: tpu_vm.sh create|sync|setup|train|exec|delete NAME ...}"
name="${2:?TPU name required}"
shift 2 || true

gtpu() { gcloud compute tpus tpu-vm "$@" --zone "$ZONE"; }

case "$cmd" in
  create)
    extra=()
    [[ "${1:-}" == "--spot" ]] && extra+=(--spot)
    gtpu create "$name" \
      --accelerator-type "$ACCEL" \
      --version "$VERSION" \
      "${extra[@]}"
    ;;
  sync)
    # Ship a tarball (spotty syncFilters analog): scp has no --exclude
    # option, and `scp -r dir existing-dir` would nest the repo one level
    # deeper on every re-sync — tar+unpack-in-place has neither problem.
    tarball="$(mktemp /tmp/wavjepa_sync.XXXXXX.tar.gz)"
    trap 'rm -f "$tarball"' EXIT
    tar -C "$REPO_DIR" -czf "$tarball" \
      --exclude='.git' --exclude='__pycache__' --exclude='.pytest_cache' \
      --exclude='*.so' .
    gtpu scp --worker=all "$tarball" "$name":/tmp/wavjepa_sync.tar.gz
    gtpu ssh "$name" --worker=all --command \
      "mkdir -p ~/wavjepa_tpu_repo && tar -xzf /tmp/wavjepa_sync.tar.gz -C ~/wavjepa_tpu_repo && rm -f /tmp/wavjepa_sync.tar.gz"
    ;;
  setup)
    gtpu ssh "$name" --worker=all --command \
      "cd ~/wavjepa_tpu_repo && pip install -e . && python -m wavjepa_tpu.data._native.build"
    ;;
  train)
    # multi-host: JAX discovers the slice topology itself on TPU-VM; each
    # worker runs the same command (train/loop shards batches over the mesh)
    gtpu ssh "$name" --worker=all --command \
      "cd ~/wavjepa_tpu_repo && nohup python train.py $* > train_\$(hostname).log 2>&1 &"
    ;;
  exec)
    [[ "${1:-}" == "--" ]] && shift
    gtpu ssh "$name" --worker=all --command "cd ~/wavjepa_tpu_repo && $*"
    ;;
  delete)
    gtpu delete "$name" --quiet
    ;;
  *)
    echo "unknown command: $cmd" >&2
    exit 2
    ;;
esac
