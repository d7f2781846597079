import time, numpy as np
from tpusfm import SfMConfig
from tpusfm.io import load_image_directory
from tpusfm.pipeline import SfMPipeline
for mf, mm in [(2048, 1024), (5120, 2048)]:
    cfg = SfMConfig(downscale=1.0, console_debug_level=5, max_features=mf, max_matches=mm)
    imgs = load_image_directory('/root/reference/dataset/crazyhorse', cfg.downscale)
    pipe = SfMPipeline(imgs.gray, cfg, images_rgb=imgs.rgb)
    rec = pipe.run()           # cold
    pipe.reset()
    t0=time.time(); rec = pipe.run(); warm=time.time()-t0
    print(f'RESULT mf={mf}: warm={warm:.2f}s pts={rec.num_points} cams={int(rec.pose_valid.sum())} err={rec.mean_reprojection_error:.3f}')
    print('RESULT stages:', {k: round(v,2) for k,v in rec.stats.items()})
