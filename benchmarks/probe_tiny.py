"""Tiny TPU tunnel-health probe: times device init and a trivial jit.

Phases printed: client_init_s (PJRT make_c_api_client through the tunnel),
tiny_compile_s (trace+compile+load of a 1-matmul program), tiny_exec_s
(second execution).  A wedged tunnel hangs in phase 1 — run under timeout.
"""
import json
import sys
import time

t0 = time.time()
import jax
import jax.numpy as jnp

devs = jax.devices()  # forces client init
client_init_s = time.time() - t0

x = jnp.ones((256, 256), jnp.bfloat16)

t0 = time.time()
f = jax.jit(lambda a: jnp.sum((a @ a).astype(jnp.float32)))
float(f(x))
tiny_compile_s = time.time() - t0

t0 = time.time()
float(f(x))
tiny_exec_s = time.time() - t0

print(json.dumps({
    "devices": str(devs),
    "client_init_s": round(client_init_s, 2),
    "tiny_compile_s": round(tiny_compile_s, 2),
    "tiny_exec_s": round(tiny_exec_s, 4),
}))
sys.exit(0)
