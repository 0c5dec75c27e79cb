"""pscratch3 on-chip parity (vs bf16 mode and vs XLA dequant reference)
+ the 8B timing. The interpret-mode diff (~0.1) may be an artifact of the
biased-part magnitude; the real MXU accumulates f32."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/awq_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import jax, jax.numpy as jnp, numpy as np
from awq_tpu.ops.megakernel import w4a16_llama_layer_step
from awq_tpu.ops.w4a16 import quantize_linear, tile_qlinear, qlinear_apply

nq = nkv = 2; hd, L, T, I = 128, 2, 256, 256; H = nq*hd
ks = jax.random.split(jax.random.PRNGKey(0), 8)
def mk(key, ic, oc):
    ql = quantize_linear(jax.random.normal(key,(ic,oc),jnp.float32)*0.05)
    qs = jax.tree_util.tree_map(lambda a: jnp.broadcast_to(a[None],(L,)+a.shape), ql)
    return ql, tile_qlinear(qs, block_n=128, fold_scales=True)
q0,wqkv=mk(ks[0],H,(nq+2*nkv)*hd); q1,wo=mk(ks[1],H,H); q2,wgu=mk(ks[2],H,2*I); q3,wdn=mk(ks[3],I,H)
ln=jnp.ones((L,H),jnp.float32)
cache=(jax.random.normal(ks[4],(L,2,1,nkv,T,hd),jnp.float32)*0.2).astype(jnp.bfloat16)
h=(jax.random.normal(ks[5],(1,H),jnp.float32)*0.3).astype(jnp.bfloat16)
cos=jnp.full((hd,),0.8,jnp.float32); sin=jnp.sqrt(1-cos*cos)
args=(h,wqkv,wo,wgu,wdn,ln,ln,cos,sin,cache,jnp.int32(1),jnp.int32(37))
kw=dict(nq=nq,nkv=nkv,eps=1e-5)
out_b = [np.asarray(x, np.float32) for x in w4a16_llama_layer_step(*args,**kw,unpack="bf16")]
out_3 = [np.asarray(x, np.float32) for x in w4a16_llama_layer_step(*args,**kw,unpack="pscratch3")]
out_2 = [np.asarray(x, np.float32) for x in w4a16_llama_layer_step(*args,**kw,unpack="pscratch2")]
for n,(a,b) in zip("h k v".split(), zip(out_3, out_b)):
    print(f"TPU ps3-vs-bf16 {n}: {np.abs(a-b).max():.6f}", flush=True)
for n,(a,b) in zip("h k v".split(), zip(out_2, out_b)):
    print(f"TPU ps2-vs-bf16 {n}: {np.abs(a-b).max():.6f}", flush=True)
