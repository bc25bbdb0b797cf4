"""The TCE_* environment-flag registry — the whole surface, in one place.

The reference scatters its runtime switches over Makefile #defines
(QM_x86/USE_INT8_INT4_PRODUCT/PACK_QK/DEC_SHARED_MEM — llm/Makefile:29-130);
this framework's equivalent is a handful of TCE_* environment variables.
Sprawl is the same failure mode either way, so every recognized flag is
declared HERE, and ``warn_unknown_flags()`` (run once at package import)
warns about any TCE_* variable in the environment that is not registered —
a mistyped kill-switch (TCE_NO_CTXCAP missing its underscore, say) must be
loud, not silently inert.

Readers still consume os.environ directly at their use sites (some are
read at import time, some per call); this module is the registry and the
typo guard, not an indirection layer.
"""

from __future__ import annotations

import os
import warnings

# name -> (default, one-line effect, when to touch)
KNOWN_FLAGS: dict[str, tuple[str, str, str]] = {
    "TCE_DECODE_FUSED": (
        "0",
        "use the fused norm-prologue/RoPE-epilogue int4 decode kernels "
        "(ops/int4_matmul.py int4_matmul_fused); 'force' = CPU interpret "
        "mode for tests",
        "never in production: measured ~1% SLOWER than unfused on chip "
        "(PERF.md r3 table); kept as an engineering record",
    ),
    "TCE_DECODE_BLOCKS": (
        "(empty)",
        "override the int4 matmul (block_n, block_k) per shape: "
        "'K,N:bn,bk;K,N:bn,bk'",
        "A/B tuning only; the 256-token study bounded all candidates "
        "within +-1% of the (2048, 2048) default (PERF.md negative #1)",
    ),
    "TCE_DECODE_KOUTER": (
        "(empty)",
        "route shapes to the K-outer kernel variant: 'K,N:bn,bk;...'",
        "never in production: slower at every blocking (PERF.md negative "
        "#6); kept as an engineering record",
    ),
    "TCE_NO_CTXCAP": (
        "0",
        "disable ctx_cap KV-DMA trimming in flash_decode (full-grid "
        "streaming)",
        "emergency kill-switch if a ctx_cap flash-decode mode ever "
        "miscomputes on chip (all modes validated OK 2026-08-18)",
    ),
    "TCE_NO_NATIVE": (
        "0",
        "skip the C++ native library (threaded file reader, BPE engine); "
        "pure-Python fallbacks take over",
        "debugging native-extension build problems",
    ),
    "TCE_STT_CMD": (
        "(empty)",
        "speech-to-text command for voicechat (reads WAV path argv, prints "
        "transcript) — whisper.cpp-style protocol (tools/speech.py)",
        "configuring voice chat (chat.py -v)",
    ),
    "TCE_TTS_CMD": (
        "(empty)",
        "text-to-speech command for voicechat (text on stdin) — "
        "piper-style protocol (tools/speech.py)",
        "configuring voice chat (chat.py -v)",
    ),
    "TCE_TRACE_CPU": (
        "0",
        "scripts/trace_decode.py only: force the CPU backend for a "
        "smoke-test trace",
        "testing the trace harness without a TPU",
    ),
    "TCE_BENCH_NO_CACHE": (
        "0",
        "scripts/bench_serving.py only: skip the persistent XLA "
        "compilation cache (force cold compiles)",
        "isolating compile-cache effects in bench runs",
    ),
}


def warn_unknown_flags(environ=None) -> list[str]:
    """Warn (once per process, via warnings) about unrecognized TCE_* env
    vars; returns the offending names (for the test)."""
    env = os.environ if environ is None else environ
    unknown = sorted(k for k in env if k.startswith("TCE_")
                     and k not in KNOWN_FLAGS)
    for name in unknown:
        warnings.warn(
            f"unrecognized environment flag {name!r} — known TCE_* flags: "
            f"{', '.join(sorted(KNOWN_FLAGS))} (see README 'Environment "
            f"flags'); a typo here silently disables the intended switch",
            RuntimeWarning, stacklevel=2)
    return unknown
