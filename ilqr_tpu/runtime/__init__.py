"""Native (C++) runtime components — trajectory I/O and host-side MPC
utilities. Built via ``make -C ilqr_tpu/runtime`` (ctypes bindings); every
consumer has a pure-Python fallback, so the extension is optional."""
