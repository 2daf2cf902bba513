from neuray_tpu.ops.geometry import (
    pose_inverse,
    coords2rays,
    depth2points,
    project_points_coords,
    project_points_directions,
    project_points_ref_views,
)
from neuray_tpu.ops.sampling import (
    depth2dists,
    depth2inv_dists,
    sample_depth,
    sample_fine_depth,
)
from neuray_tpu.ops.interpolate import grid_sample_nhwc, interpolate_feats
from neuray_tpu.ops.compositing import alpha_values2hit_prob
from neuray_tpu.ops.mixture import get_near_far_points, compute_prob
from neuray_tpu.ops.sh import sh_basis, sh_fit, sh_predict
