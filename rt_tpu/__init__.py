"""rt_tpu — a TPU-native differentiable path-tracing framework.

A from-scratch JAX/XLA/Pallas re-design of the capability union of
WhenMelancholy/ray-tracing-in-cuda (CUDA megakernel renderer, CPU/OpenMP
renderers, Taichi wavefront renderer, naive Russian-roulette tracer):

- Scenes are flat SoA pytrees of arrays (no object graphs, no device
  migration step — the CUDA reference's dual host/device graph dance in
  gpu-version/parser.hpp + main.cu:374-446 is eliminated by design).
- The integrator is a wavefront bounce loop (lax.scan / lax.while_loop)
  over ray populations; per-bounce closest-hit is formulated so the
  ray x primitive bilinear terms run on the MXU.
- RNG is counter-based and keyed on (pixel, sample, bounce, purpose),
  replacing per-pixel stateful curand (gpu-version/main.cu:120-125) and
  making resume + gradient replay exact.
- Distribution is a jax.sharding.Mesh over pixels/sample batches with
  psum accumulation, replacing process-level frame farming
  (gpu-version/blue.py:23-35).
"""

__version__ = "0.1.0"

from rt_tpu.config import RenderConfig  # noqa: F401
