import glob, gzip, json, collections, sys
import numpy as np
import jax, jax.numpy as jnp
from ntsc_crt_tpu.models.systems import SYSTEMS
from ntsc_crt_tpu.parallel import mesh as pmesh

system = sys.argv[1] if len(sys.argv) > 1 else "NTSC"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
cfg = SYSTEMS[system]
states = pmesh.init_batch(cfg, B, 640, 480)
step = pmesh.make_batched_step(cfg, noise=12)
rng = np.random.RandomState(0)
if cfg.kind == "nes":
    imgs = jnp.asarray(rng.randint(0, 512, (B, 240, 256), np.uint16))
else:
    imgs = jnp.asarray(rng.randint(0, 256, (B, 240, 320, 3), np.uint8))
z = jnp.zeros((B,), jnp.int32)
chk = jax.jit(lambda s: s.out.astype(jnp.int32).sum())
states = step(states, imgs, z, z, z)
chk(states).item()

jax.profiler.start_trace("/tmp/nttrace")
for _ in range(3):
    states = step(states, imgs, z, z, z)
chk(states).item()
jax.profiler.stop_trace()

files = glob.glob("/tmp/nttrace/**/*.trace.json.gz", recursive=True)
ev = json.load(gzip.open(files[-1]))["traceEvents"]
agg = collections.Counter(); names = {}
total = 0
for e in ev:
    if e.get("ph") == "X" and "dur" in e and not e.get("name", "").startswith("$"):
        n = e.get("name", "?")
        if n.startswith(("jit_", "Pjit", "np.")): continue
        agg[n] += e["dur"]; total += e["dur"]
        ln = e.get("args", {}).get("long_name")
        if ln: names[n] = ln
print(f"device total {total/1e3:.1f} ms over 3 calls, B={B}")
for name, dur in agg.most_common(16):
    print(f"{dur/1e3:9.2f} ms  {name[:55]}")
    if name in names:
        print(f"           -> {names[name][:200]}")
