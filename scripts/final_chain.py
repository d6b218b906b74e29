"""Final round-2 chain: spp-32 bench, blue.json demo render, dna video."""
import sys, os, subprocess
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/root/repo/.jax_cache"
r = subprocess.run([sys.executable, "bench.py", "32"], capture_output=True,
                   text=True)
print("BENCH32:", r.stdout.strip().splitlines()[-1] if r.stdout else r.stderr[-200:], flush=True)
# blue.json production render for docs (reference's flagship 2560x1440 scene
# at a reduced spp for the demo image)
r = subprocess.run([sys.executable, "-m", "rt_tpu", "render", "-f",
                    "/root/reference/gpu-version/blue.json", "-spp", "64",
                    "-o", "docs/blue_scene_r2.png", "--view-gamma",
                    "--log", "/tmp/t.log"], capture_output=True, text=True)
print("BLUE:", (r.stdout or r.stderr).strip()[-200:], flush=True)
# dna animation + gif for docs (video synthesis end to end on TPU)
r = subprocess.run([sys.executable, "-m", "rt_tpu", "animate", "--kind",
                    "dna", "--frames", "12", "--deg-per-frame", "6",
                    "--outdir", "/tmp/dna_frames", "-w", "320",
                    "--height", "180", "-spp", "32", "-d", "16",
                    "--video", "docs/dna.gif", "--fps", "8"],
                   capture_output=True, text=True)
print("DNA:", (r.stdout or r.stderr).strip()[-300:], flush=True)
