#!/bin/bash
# X-ARES evaluation launcher — counterpart of /root/reference/run_xares.sh
# (SLURM array over 20 X-ARES tasks invoking `python -m xares.run` against a
# wavjepa encoder module). The encoder contract module lives at
# wavjepa_tpu/eval/xares/encoder.py; wavjepa_tpu.eval.xares.run defers to the
# real xares harness when installed, else exercises the identical
# frozen-encoder → probe protocol on a built-in stub task.
#
# Usage: CKPT=/path/to/ckpt scripts/run_xares.sh [task ...]
set -e
cd "$(dirname "$0")/.."

tasks=("$@")
if [ ${#tasks[@]} -eq 0 ]; then
  if python -c "import xares" 2>/dev/null; then
    tasks=(
      asvspoof_task.py clotho_task.py crema_d_task.py desed_task.py
      esc50_task.py fluentspeechcommands_kws_task.py
      freemusicarchive_genre_task.py fsd50k_task.py fsdkaggle2018_task.py
      gtzan_task.py libricount_task.py librispeech_male_female_task.py
      nsynth_instument_task.py ravdess_task.py speechcommandsv1_task.py
      urbansound8k_task.py vocalimitations_task.py vocalsound_task.py
      voxceleb1_task.py voxlingua33_task.py
    )
  else
    echo "xares package not installed - running built-in stub task end-to-end"
    tasks=(stub)
  fi
fi

for task in "${tasks[@]}"; do
  echo "=== X-ARES task: $task ==="
  python -m wavjepa_tpu.eval.xares.run "$task" --ckpt "${CKPT:-}" --max-jobs 1
done
