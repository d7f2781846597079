import time, numpy as np, jax, jax.numpy as jnp
import tpusfm
from tests import fixtures
from tpusfm.ba import BAProblem, lm_solve
from tpusfm import camera

rng = np.random.default_rng(0)
V, N = 7, 1024
intr = fixtures.intrinsics()
pts = jnp.asarray(np.stack([rng.uniform(-4,4,N), rng.uniform(-3,3,N), rng.uniform(8,20,N)],1).astype(np.float32))
poses = [fixtures.mock_pose((2.*v,3.,5.),(-1.+0.3*v,0.,1.)) for v in range(V)]
uv = jnp.stack([fixtures.project(p, pts, intr) for p in poses], axis=1)
Rt = jnp.stack(poses)
cams = jnp.concatenate([camera.matrix_to_rodrigues_b(Rt[:,:,:3]), Rt[:,:,3]], axis=1)
cams = cams + 0.01*jnp.asarray(rng.standard_normal(cams.shape), jnp.float32)
prob = BAProblem(cams=cams, points=pts, focal=intr.focal, uv=uv-intr.pp[None,None,:],
                 mask=jnp.ones((N,V),bool), cam_valid=jnp.ones((V,),bool), pt_valid=jnp.ones((N,),bool))
for iters in (1, 10, 50):
    f = jax.jit(lambda p: lm_solve(p, max_iterations=iters, function_tolerance=0.0))
    r = f(prob); r[0].cams.block_until_ready()
    t0=time.time(); r = f(prob); r[0].cams.block_until_ready(); dt=time.time()-t0
    print(f'RESULT iters={iters}: {dt:.3f}s  ({dt/iters*1000:.1f} ms/iter) cost {float(r[1].initial_cost):.2f}->{float(r[1].final_cost):.4f}')
