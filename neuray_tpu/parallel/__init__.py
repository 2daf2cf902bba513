from neuray_tpu.parallel.sharding import (
    make_mesh, make_sharded_render_fn, make_dp_train_step)
