import sys, json
sys.path.insert(0, "/root/repo")
from pdwt_tpu.utils import enable_compile_cache
enable_compile_cache()
import numpy as np
import jax.numpy as jnp
from pdwt_tpu.core.depth_matmul import depth_analysis_mm, depth_synthesis_mm
from pdwt_tpu.kernels.depth_fir_pallas import depth_swt_analysis, depth_swt_synthesis
from pdwt_tpu.core import conv
from pdwt_tpu.filters import get_wavelet
from pdwt_tpu.utils import device_time_any

w = get_wavelet("db4")
D, R, C = 64, 512, 512
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((1, 4, D, R, C)), jnp.float32)
z = jnp.asarray(rng.standard_normal((1, 8, D, R, C)), jnp.float32)
rows = {}
# correctness on chip vs fma
ref = conv.analysis_pass(x, (w.dec_lo, w.dec_hi), axis=-3, dilation=1,
                         decimate=False, backend="fma")
got = depth_swt_analysis(x, (w.dec_lo, w.dec_hi), dilation=1)
rows["ana_dev"] = float(jnp.abs(ref - got).max())
refs = conv.synthesis_pass(z, (w.rec_lo*0.5, w.rec_hi*0.5), axis=-3,
                           out_len=D, dilation=1, decimated=False,
                           backend="fma")
gots = depth_swt_synthesis(z, (w.rec_lo*0.5, w.rec_hi*0.5), dilation=1)
rows["syn_dev"] = float(jnp.abs(refs - gots).max())
print("devs:", rows, flush=True)

for dil in (1, 2):
    t = device_time_any(lambda v, _d=dil: depth_swt_analysis(
        v, (w.dec_lo, w.dec_hi), dilation=_d), x)
    rows[f"fir_ana_dil{dil}_ms"] = round(t*1e3, 3)
    t2 = device_time_any(lambda v, _d=dil: depth_analysis_mm(
        v, (w.dec_lo, w.dec_hi), dilation=_d, decimate=False), x)
    rows[f"mm_ana_dil{dil}_ms"] = round(t2*1e3, 3)
    t3 = device_time_any(lambda v, _d=dil: depth_swt_synthesis(
        v, (w.rec_lo*0.5, w.rec_hi*0.5), dilation=_d), z)
    rows[f"fir_syn_dil{dil}_ms"] = round(t3*1e3, 3)
    t4 = device_time_any(lambda v, _d=dil: depth_synthesis_mm(
        v, (w.rec_lo*0.5, w.rec_hi*0.5), out_len=D, dilation=_d,
        decimated=False), z)
    rows[f"mm_syn_dil{dil}_ms"] = round(t4*1e3, 3)
    print({k: v for k, v in rows.items() if f"dil{dil}" in k}, flush=True)
print(json.dumps(rows), flush=True)
