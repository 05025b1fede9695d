"""X-ARES evaluation surface.

The reference evaluates WavJEPA on the X-ARES benchmark by pointing
``python -m xares.run`` at an encoder module conforming to the X-ARES
encoder contract (/root/reference/run_xares.sh:42 consumes
``example/wavjepa_ls/wavjepa_encoder.py``). That encoder module is not part
of the reference repo; this package supplies the full counterpart:

  * `encoder` — `WavJEPAEncoder`, the xares-contract wrapper over the
    TPU runtime (what `xares.run` imports);
  * `checker` — first-party re-implementation of xares'
    `check_audio_encoder` validation, so the contract is testable without
    the external package;
  * `run` — a task runner: delegates to the real `xares.run` when the
    package is installed, else runs the same frozen-encoder → MLP-probe
    protocol on a built-in stub task end-to-end.
"""

from wavjepa_tpu.eval.xares.checker import check_audio_encoder
from wavjepa_tpu.eval.xares.encoder import WavJEPAEncoder

__all__ = ["WavJEPAEncoder", "check_audio_encoder"]
