"""Native (C++) runtime components — trajectory I/O and host-side MPC
utilities. Built via ``make -C ilqr_tpu/runtime/native`` (ctypes bindings);
every consumer has a pure-Python fallback, so the extension is optional.

``from ilqr_tpu.runtime import trajio`` raises ImportError when the shared
library can't be built/loaded; callers catch it and fall back.
"""
