"""Small repo-friendly previews of the production animations: a 480p
GIF from every Nth frame (the full PNG/JPG sequences + video stay in
outputs/)."""
import sys
import glob
import os
from PIL import Image

src = sys.argv[1]            # frame dir
out = sys.argv[2]            # .gif path
step = int(sys.argv[3]) if len(sys.argv) > 3 else 8
w = int(sys.argv[4]) if len(sys.argv) > 4 else 480

frames = sorted(glob.glob(os.path.join(src, "frame_*.png"))
                or glob.glob(os.path.join(src, "out*.jpg")),
                key=lambda p: int("".join(c for c in os.path.basename(p)
                                          if c.isdigit())))
sel = frames[::step]
imgs = []
for p in sel:
    im = Image.open(p).convert("RGB")
    im.thumbnail((w, w))
    imgs.append(im)
assert imgs, src
imgs[0].save(out, save_all=True, append_images=imgs[1:],
             duration=120, loop=0)
print(f"{out}: {len(imgs)} frames from {len(frames)}")
