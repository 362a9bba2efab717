"""DEC segment-scan ablation (RESULTS.md "DEC/AEC step-gap analysis").

Run from the repo root on the TPU: `python benchmarks/dec_variants.py`.
Variants: A current segment fn, B rec-only loss (no student-t/KLD),
C donated train state, D whole-epoch AEC scan (upper bound).
"""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import spectrogram_cube_clustering_tpu as scc
from spectrogram_cube_clustering_tpu.ops.student_t import target_distribution
from spectrogram_cube_clustering_tpu.train.dec import _pad_p, make_segment_fn
from jax.scipy.special import xlogy

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

n_samples, batch = 262144, 4096
x, _ = scc.data.synthetic_windows(n_samples, n_classes=5, seed=0)
x = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))
data = scc.train.make_batched_data(x, batch_size=batch)
model = scc.models.DEC(n_clusters=5)
state = scc.train.create_train_state(model, jax.random.key(0), jnp.asarray(x[:4]), lr=1e-3)
q, _, _ = scc.train.full_eval(model, state.params, data)
p_all = _pad_p(target_distribution(q), data.n_batches, batch)

def timeit(step, state0, reps=3):
    """step(state) -> (state', out). The state CHAINS through reps so every
    execute call has fresh inputs — same-input loops can be memoized by the
    remote tunnel client and report impossible numbers (CLAUDE.md trap)."""
    s, out = step(state0)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(reps):
        s, out = step(s)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    return n_samples * reps / (time.perf_counter() - t0)

# A: current segment fn
seg = make_segment_fn(model, 0.001, data.n_batches)
print("A current  :", f"{timeit(lambda s: seg(s, data.x, data.mask, p_all, jnp.array(0)), state):,.0f}")

# B: rec-only loss (no q/KLD) same structure
def make_rec_only(seg_len):
    @jax.jit
    def segment(state, x_all, m_all, start):
        xs = jax.lax.dynamic_slice_in_dim(x_all, start, seg_len, 0)
        ms = jax.lax.dynamic_slice_in_dim(m_all, start, seg_len, 0)
        def step(state, batch):
            x, mask = batch
            def lf(params):
                q, x_rec, _ = model.apply({"params": params}, x)
                d = x_rec - x
                per = jnp.mean(d*d, axis=tuple(range(1, x.ndim)))
                nv = jnp.maximum(jnp.sum(mask), 1.0)
                return jnp.sum(per*mask)/nv, nv
            (l, nv), g = jax.value_and_grad(lf, has_aux=True)(state.params)
            return state.apply_gradients(grads=g), (l*nv, nv)
        return jax.lax.scan(step, state, (xs, ms))
    return segment
segB = make_rec_only(data.n_batches)
print("B rec-only :", f"{timeit(lambda s: segB(s, data.x, data.mask, jnp.array(0)), state):,.0f}")

# C: current + donated state
def make_donated(seg_len):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def segment(state, x_all, m_all, p_all, start):
        xs = jax.lax.dynamic_slice_in_dim(x_all, start, seg_len, 0)
        ms = jax.lax.dynamic_slice_in_dim(m_all, start, seg_len, 0)
        ps = jax.lax.dynamic_slice_in_dim(p_all, start, seg_len, 0)
        def step(state, batch):
            x, mask, p = batch
            def lf(params):
                q, x_rec, _ = model.apply({"params": params}, x)
                d = x_rec - x
                per = jnp.mean(d*d, axis=tuple(range(1, x.ndim)))
                nv = jnp.maximum(jnp.sum(mask), 1.0)
                rec = jnp.sum(per*mask)/nv
                log_q = jnp.log(jnp.maximum(q, jnp.finfo(q.dtype).tiny))
                row = jnp.sum(xlogy(p, p) - p*log_q, axis=-1)
                cl = 0.001*jnp.sum(row*mask)/nv
                return rec+cl, (rec, cl, nv)
            (l,(r,c,nv)), g = jax.value_and_grad(lf, has_aux=True)(state.params)
            return state.apply_gradients(grads=g), (l*nv, r*nv, c*nv, nv)
        return jax.lax.scan(step, state, (xs, ms, ps))
    return segment
segC = make_donated(data.n_batches)
print("C donated  :", f"{timeit(lambda s: segC(s, data.x, data.mask, p_all, jnp.array(0)), state):,.0f}")

# D: AEC epoch for comparison
aec = scc.models.AEC()
ast = scc.train.create_train_state(aec, jax.random.key(0), jnp.asarray(x[:4]), lr=1e-4)
te, _ = scc.train.aec.make_epoch_fns(aec)
print("D aec epoch:", f"{timeit(lambda s: te(s, data.x, data.mask), ast):,.0f}")
