"""The NeuRay renderer as a Flax module + jit-compiled chunked drivers.

Re-designed TPU-first from the reference orchestration (reference
network/renderer.py):
  * imgs_info dicts become channels-last pytrees of static-shaped arrays;
  * the python ray-batch loop (reference renderer.py:237-252) becomes
    ``jax.lax.map`` over fixed-size ray microbatches inside ONE jit
    program (see render_full below), with rays padded to a multiple of
    the chunk size;
  * per-scene work (init net -> G', image encoder, vis encoder) runs once
    in ``encode_scene``; per-chunk work touches only gathered features.

Key naming follows the reference (qn/rn/dn/rfn, pixel_colors_nr, ...) so
losses/metrics/CLIs keep parity.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from neuray_tpu.ops import geometry as G
from neuray_tpu.ops import sampling as S
from neuray_tpu.ops.compositing import alpha_values2hit_prob, composite_colors
from neuray_tpu.ops.interpolate import (
    grid_sample_nhwc, interpolate_feature_map, make_quad_map,
    gather_bilinear_quad, make_fused_scene_map, gather_bilinear_fused,
    make_fused_scene_map_u8, gather_bilinear_fused_u8,
    fused_map_supported)
from neuray_tpu.ops import sh as SH
from neuray_tpu.models.resunet import ResUNetLight
from neuray_tpu.models.vis_encoder import name2vis_encoder
from neuray_tpu.models.dist_decoder import name2dist_decoder
from neuray_tpu.models.agg_net import name2agg_net
from neuray_tpu.models.init_net import name2init_net


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static renderer configuration (reference base_cfg, renderer.py:25-52
    + gen default_cfg :257-262), as a hashable frozen dataclass."""
    vis_encoder_type: str = "default"
    dist_decoder_type: str = "mixture_logistics"
    agg_net_type: str = "default"
    init_net_type: str = "depth"

    use_vis: bool = True           # dist_decoder_cfg.use_vis
    fine_use_vis: bool = True      # fine_dist_decoder_cfg.use_vis
    neuray_dim: int = 32
    cost_volume_sn: int = 64       # init_net_cfg.cost_volume_sn
    # DepthInitNet eval knob: compute the rfn^2*h*w cross-view diff
    # gather on a 1/s pixel subgrid (models/init_net.py) — the encode's
    # dominant cost at bench shapes. 1 = exact reference parity.
    init_diff_scale: int = 1

    use_hierarchical_sampling: bool = False
    fine_depth_sample_num: int = 64
    fine_depth_use_all: bool = False
    ray_batch_num: int = 2048
    depth_sample_num: int = 64
    alpha_value_ground_state: float = -15.0
    use_dr_prediction: bool = False
    use_nr_color_for_dr: bool = False
    use_self_hit_prob: bool = False
    use_ray_mask: bool = True
    ray_mask_view_num: int = 2
    ray_mask_point_num: int = 8
    render_depth: bool = False

    use_depth_loss: bool = False
    depth_loss_coords_num: int = 8192

    # Depth samples for the cheap emptiness probe (three-phase skip
    # render, render_frame_probe_skip): gather taps scale linearly in
    # this, surface detection only needs coarse coverage of the range.
    probe_sample_num: int = 16

    # Probe-FOCUSED render (render_frame_probe_focus): the probe also
    # returns each kept ray's hit-mass interval, and the coarse+fine
    # passes run only inside that narrowed window with reduced sample
    # counts at >= the full render's sample density. focus_margin probe
    # bins are added on each side of the [focus_quantile, 1-q] mass
    # interval; rays with probe mass below ~1e-3 (e.g. dilated-in
    # silhouette rays) fall back to the full range.
    focus_sample_num: int = 16
    focus_fine_sample_num: int = 32
    focus_margin: int = 1
    focus_quantile: float = 0.005

    use_bf16: bool = False         # bf16 conv/agg compute on the MXU
    # "none" | "u8": quantize the fused gather map to uint8 rows
    # (403B < the 512B index-rate knee; rgb exact for 8-bit sources,
    # feats per-channel absmax — quality quantified in
    # tools/check_bf16_quality.py). Only takes effect with use_bf16.
    gather_quant: str = "none"

    @classmethod
    def from_cfg(cls, cfg: Dict[str, Any]) -> "RenderConfig":
        """Build from a reference-style flat YAML cfg dict."""
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in cfg.items() if k in known}
        dd = cfg.get("dist_decoder_cfg", {}) or {}
        fdd = cfg.get("fine_dist_decoder_cfg", {}) or {}
        if "use_vis" in dd:
            kwargs["use_vis"] = dd["use_vis"]
        kwargs["fine_use_vis"] = fdd.get(
            "use_vis", kwargs.get("use_vis", True))
        inc = cfg.get("init_net_cfg", {}) or {}
        if "cost_volume_sn" in inc:
            kwargs["cost_volume_sn"] = inc["cost_volume_sn"]
        if "diff_scale" in inc:
            kwargs["init_diff_scale"] = inc["diff_scale"]
        return cls(**kwargs)


class NeurayRenderer(nn.Module):
    """All submodules of the (generalization) renderer in one Flax tree.

    Methods are invoked through ``apply(..., method=...)``; the top-level
    ``__call__`` runs one training/eval step over a single ray chunk.
    """
    cfg: RenderConfig

    def setup(self):
        c = self.cfg
        dt = jnp.bfloat16 if c.use_bf16 else None
        self.image_encoder = ResUNetLight(
            in_dim=3, layers=(1, 2, 6, 4), out_dim=32, inplanes=16,
            dtype=dt, name="image_encoder")
        self.vis_encoder = name2vis_encoder[c.vis_encoder_type](
            dtype=dt, name="vis_encoder")
        self.dist_decoder = name2dist_decoder[c.dist_decoder_type](
            {"use_vis": c.use_vis}, dtype=dt, name="dist_decoder")
        self.agg_net = name2agg_net[c.agg_net_type](
            {"neuray_dim": c.neuray_dim,
             "sample_num": c.depth_sample_num},
            dtype=dt, name="agg_net")
        if c.use_hierarchical_sampling:
            self.fine_dist_decoder = name2dist_decoder[c.dist_decoder_type](
                {"use_vis": c.fine_use_vis}, dtype=dt,
                name="fine_dist_decoder")
            self.fine_agg_net = name2agg_net[c.agg_net_type](
                {"neuray_dim": c.neuray_dim,
                 "sample_num": c.fine_depth_sample_num},
                dtype=dt, name="fine_agg_net")
        if c.init_net_type:
            self.init_net = name2init_net[c.init_net_type](
                {"cost_volume_sn": c.cost_volume_sn,
                 "diff_scale": c.init_diff_scale}, dtype=dt,
                name="init_net")
        self.sh_regs = jnp.asarray(SH.sh_regs(3))

    # ---------------- per-scene stages ----------------

    def initialize_ray_feats(self, ref: Dict[str, jnp.ndarray],
                             src: Optional[Dict[str, jnp.ndarray]] = None,
                             is_train: bool = False):
        """Init net: build raw visibility features G' [rfn, h/4, w/4, 32].
        (reference renderer.py:268-269)."""
        return self.init_net(ref, src, is_train)

    def encode_scene(self, ref: Dict[str, jnp.ndarray],
                     ray_feats_raw: jnp.ndarray):
        """Image encoder + vis encoder -> per-scene feature cache.
        (reference renderer.py:228-231)."""
        img_feats = self.image_encoder(ref["imgs"]).astype(jnp.float32)
        ray_feats = self.vis_encoder(
            ray_feats_raw, img_feats).astype(jnp.float32)
        return img_feats, ray_feats

    def build_gather_cache(self, ref: Dict[str, jnp.ndarray]):
        """Add quad-packed maps for single-gather bilinear sampling.

        Only valid when ray/img feature maps share a resolution (the gen
        pipeline); callers with odd-resolution ray feats (FT from
        scratch) fall back to the plain gathers automatically. Under
        use_bf16 the quad maps are stored bf16 (halves gather traffic;
        the downstream MLPs run bf16 anyway).
        """
        ref = dict(ref)
        if ref["ray_feats"].shape[1:3] == ref["img_feats"].shape[1:3]:
            dt = jnp.bfloat16 if self.cfg.use_bf16 else None
            def cast(x):
                return x.astype(dt) if dt is not None else x
            h, w = ref["imgs"].shape[1:3]
            fh, fw = ref["ray_feats"].shape[1:3]
            feats = cast(jnp.concatenate(
                [ref["ray_feats"], ref["img_feats"]], axis=-1))
            if (self.cfg.gather_quant == "u8" and dt is not None
                    and fused_map_supported(h, w, fh, fw)):
                fused, scale, offset = make_fused_scene_map_u8(
                    ref["imgs"], feats, h, w)
                ref["fused_map_u8"] = fused
                ref["fused_scale"] = scale
                ref["fused_offset"] = offset
            elif fused_map_supported(h, w, fh, fw):
                # ONE gather tap per (point, view): feats quad + packed
                # full-res rgb patch (see ops.interpolate.
                # make_fused_scene_map — the gather is index-rate bound,
                # so halving taps halves the dominant frame cost).
                ref["fused_map"] = make_fused_scene_map(
                    cast(ref["imgs"]), feats, h, w)
            else:
                ref["rgb_quad"] = make_quad_map(cast(ref["imgs"]))
                ref["feats_quad"] = make_quad_map(feats)
        return ref

    # ---------------- per-chunk rendering ----------------

    def _predict_proj_ray_prob(self, prj, ref_depth_range, que_dists,
                               is_fine: bool):
        """(reference renderer.py:67-83)"""
        decoder = self.fine_dist_decoder if is_fine else self.dist_decoder
        mean, var, vis, aw = decoder(prj["ray_feats"])
        alpha, visibility, hit_prob = decoder.compute_prob(
            prj["depth"][..., 0], que_dists[None], mean, var, vis, aw,
            True, ref_depth_range)
        mask = prj["mask"]
        gs = self.cfg.alpha_value_ground_state
        prj["alpha"] = alpha[..., None] * mask + (1.0 - mask) * gs
        prj["vis"] = visibility[..., None] * mask
        prj["hit_prob"] = hit_prob[..., None] * mask
        return prj

    def _project_and_gather(self, ref, que_pts):
        """Project sample points into every ref view and gather rgb,
        image features and visibility features (reference
        render_ops.py:132-144 + renderer.py:127-135, fused)."""
        qn, rn, dn, _ = que_pts.shape
        rfn, h, w, _ = ref["imgs"].shape
        pts = que_pts.reshape(qn * rn * dn, 3)
        prj_dir, prj_pts, prj_depth, prj_mask = G.project_points_ref_views(
            ref["poses"], ref["Ks"], h, w, pts)
        maskf = prj_mask.astype(jnp.float32)

        mcol = maskf[..., None]
        if "fused_map_u8" in ref:
            out, prj_rgb = gather_bilinear_fused_u8(
                ref["fused_map_u8"], ref["fused_scale"],
                ref["fused_offset"], prj_pts, h, w)
            mg = mcol.astype(out.dtype)
            prj_rgb = prj_rgb * mg
            out = out * mg
            nf = ref["ray_feats"].shape[-1]
            prj_ray_feats, prj_img_feats = out[..., :nf], out[..., nf:]
        elif "fused_map" in ref:
            out, prj_rgb = gather_bilinear_fused(
                ref["fused_map"], prj_pts, h, w)
            # mask in the map dtype — an f32 mask would promote the
            # wide bf16 feature rows to f32 materializations
            mg = mcol.astype(out.dtype)
            prj_rgb = prj_rgb * mg
            out = out * mg
            nf = ref["ray_feats"].shape[-1]
            prj_ray_feats, prj_img_feats = out[..., :nf], out[..., nf:]
        elif "rgb_quad" in ref:
            # quad-packed maps: ONE index-rate-bound gather per map
            # instead of four (see ops.interpolate.make_quad_map) —
            # ~3x faster interpolation on v5e, bit-identical results.
            def quad_align(q):
                return q.shape[1] + 1 == h and q.shape[2] + 1 == w
            prj_rgb = gather_bilinear_quad(
                ref["rgb_quad"], prj_pts, h, w,
                quad_align(ref["rgb_quad"])) * mcol
            out = gather_bilinear_quad(
                ref["feats_quad"], prj_pts, h, w,
                quad_align(ref["feats_quad"])) * mcol
            nf = ref["ray_feats"].shape[-1]
            prj_ray_feats, prj_img_feats = out[..., :nf], out[..., nf:]
        elif ref["ray_feats"].shape[1:3] == ref["img_feats"].shape[1:3]:
            # img_feats and ray_feats live at the same (1/4) resolution in
            # the gen pipeline: ONE fused 64-ch gather instead of two
            # (the gather is the HBM-bandwidth hot spot).
            prj_rgb = interpolate_feature_map(
                ref["imgs"], prj_pts, maskf, h, w)
            fused = jnp.concatenate([ref["ray_feats"], ref["img_feats"]],
                                    axis=-1)
            out = interpolate_feature_map(fused, prj_pts, maskf, h, w)
            nf = ref["ray_feats"].shape[-1]
            prj_ray_feats, prj_img_feats = out[..., :nf], out[..., nf:]
        else:
            prj_rgb = interpolate_feature_map(
                ref["imgs"], prj_pts, maskf, h, w)
            prj_ray_feats = interpolate_feature_map(
                ref["ray_feats"], prj_pts, maskf, h, w)
            prj_img_feats = interpolate_feature_map(
                ref["img_feats"], prj_pts, maskf, h, w)

        def rs(x):
            return x.reshape(rfn, qn, rn, dn, -1)

        return {
            "dir": rs(prj_dir), "pts": rs(prj_pts), "depth": rs(prj_depth),
            "mask": rs(maskf), "rgb": rs(prj_rgb),
            "ray_feats": rs(prj_ray_feats), "img_feats": rs(prj_img_feats),
        }

    def _network_rendering(self, prj, que_dir, is_fine: bool, pos=None):
        """(reference renderer.py:157-166)"""
        agg = self.fine_agg_net if is_fine else self.agg_net
        density, colors = agg(prj, que_dir, pos=pos)
        alpha = 1.0 - jnp.exp(-nn.relu(density))
        hit_prob = alpha_values2hit_prob(alpha)
        pixel_colors = composite_colors(hit_prob, colors)
        return hit_prob, colors, pixel_colors

    def _direct_rendering(self, prj, que_dir, colors_nr):
        """SH-fit direct rendering branch (reference renderer.py:85-125)."""
        eps = 1e-5
        prj_alpha, prj_vis = prj["alpha"], prj["vis"]
        alpha = (jnp.sum(prj_vis * prj_alpha, 0)
                 / (jnp.sum(prj_vis, 0) + eps))             # qn,rn,dn,1
        invalid_ray = (jnp.sum(prj["mask"][..., 0], 0) == 0)  # qn,rn,dn
        gs = self.cfg.alpha_value_ground_state
        alpha = (alpha[..., 0] * (1.0 - invalid_ray)
                 + invalid_ray * gs)                         # qn,rn,dn

        if self.cfg.use_nr_color_for_dr:
            colors = colors_nr
        else:
            rfn, qn, rn, dn, _ = prj["rgb"].shape
            pn = qn * rn * dn
            que_dir_flat = que_dir.reshape(pn, 3)
            prj_dir = prj["dir"].reshape(rfn, pn, 3)
            prj_rgb = prj["rgb"].reshape(rfn, pn, 3)
            prj_hit = prj["hit_prob"].reshape(rfn, pn)
            w = prj_hit / (jnp.sum(prj_hit, 0, keepdims=True) + 1e-3)
            theta = SH.sh_fit(prj_dir.transpose(1, 0, 2),
                              prj_rgb.transpose(1, 0, 2),
                              w.transpose(1, 0), regs=self.sh_regs)
            colors = SH.sh_predict(que_dir_flat[:, None], theta)
            colors = colors[:, 0].reshape(qn, rn, dn, 3)

        alpha_values = jax.nn.sigmoid(alpha)
        hit_prob = alpha_values2hit_prob(alpha_values)
        pixel_colors = composite_colors(hit_prob, colors)
        return hit_prob, colors, pixel_colors

    def _predict_self_hit_prob(self, que, que_depth, que_dists, is_fine):
        """Decode the query view's own ray features (finetune consistency
        path, reference renderer.py:137-155)."""
        qn, rn, _ = que["coords"].shape
        h, w = que["imgs"].shape[1:3]
        mask = jnp.ones((qn, rn), jnp.float32)
        que_ray_feats = interpolate_feature_map(
            que["ray_feats"], que["coords"], mask, h, w)     # qn,rn,f
        decoder = self.fine_dist_decoder if is_fine else self.dist_decoder
        mean, var, vis, aw = decoder(que_ray_feats)
        expand = lambda x: None if x is None else x[:, :, None]
        _, _, hit_prob = decoder.compute_prob(
            que_depth, que_dists, expand(mean), expand(var), expand(vis),
            expand(aw), False, que["depth_range"])
        return hit_prob

    def _render_by_depth(self, que_depth, que, ref, is_train, is_fine,
                         pos=None):
        """(reference renderer.py:168-203). ``pos``: optional per-ray
        ray-attention positions [qn,rn,dn] (probe-focused render)."""
        c = self.cfg
        que_dists = S.depth2inv_dists(que_depth, que["depth_range"])
        que_pts, que_dir = G.depth2points(
            que["coords"], que["poses"], que["Ks"], que_depth)

        prj = self._project_and_gather(ref, que_pts)
        prj = self._predict_proj_ray_prob(
            prj, ref["depth_range"], que_dists, is_fine)

        hit_prob_nr, colors_nr, pixel_colors_nr = self._network_rendering(
            prj, que_dir, is_fine, pos)
        outputs = {"pixel_colors_nr": pixel_colors_nr,
                   "hit_prob_nr": hit_prob_nr,
                   # per-sample radiance [qn,rn,dn,3]: consumed only by
                   # the window-clip dB audit (estimate_window_clip);
                   # XLA dead-code-eliminates it everywhere else (all
                   # drivers filter outputs by keep_keys inside jit)
                   "colors_nr": colors_nr}

        if c.use_dr_prediction:
            hit_prob_dr, _, pixel_colors_dr = self._direct_rendering(
                prj, que_dir, colors_nr)
            outputs["pixel_colors_dr"] = pixel_colors_dr
            outputs["hit_prob_dr"] = hit_prob_dr

        if is_train and c.use_self_hit_prob:
            outputs["hit_prob_self"] = self._predict_self_hit_prob(
                que, que_depth, que_dists, is_fine)

        if "imgs" in que and que["imgs"] is not None:
            outputs["pixel_colors_gt"] = grid_sample_nhwc(
                que["imgs"], que["coords"], align_corners=True)

        if c.use_ray_mask:
            rm = jnp.sum(prj["mask"].astype(jnp.int32), 0) > c.ray_mask_view_num
            rm = jnp.sum(rm, 2) > c.ray_mask_point_num       # qn,rn,1
            outputs["ray_mask"] = rm[..., 0]

        if c.render_depth:
            outputs["render_depth"] = jnp.sum(hit_prob_nr * que_depth, -1)
        return outputs

    def render_chunk(self, ref: Dict[str, jnp.ndarray],
                     que: Dict[str, jnp.ndarray], is_train: bool):
        """Coarse + (optionally) fine render of one ray chunk.
        (reference renderer.py:205-226)."""
        c = self.cfg
        qn, rn, _ = que["coords"].shape
        que_depth, _ = S.sample_depth(
            que["depth_range"], qn, rn, c.depth_sample_num, False)
        outputs = self._render_by_depth(que_depth, que, ref, is_train, False)

        if c.use_hierarchical_sampling:
            rng = self.make_rng("sample") if is_train else None
            fine_depth = S.sample_fine_depth(
                que_depth, jax.lax.stop_gradient(outputs["hit_prob_nr"]),
                que["depth_range"], c.fine_depth_sample_num, is_train, rng)
            if c.fine_depth_use_all:
                fine_depth = jnp.sort(
                    jnp.concatenate([que_depth, fine_depth], -1), -1)
            elif is_train:
                # random u -> unordered samples; XLA sort on TPU is slow,
                # so skip it in eval where the deterministic stratified
                # CDF inversion is already monotone (exact no-op there).
                fine_depth = jnp.sort(fine_depth, -1)
            fine_out = self._render_by_depth(
                fine_depth, que, ref, is_train, True)
            for k, v in fine_out.items():
                outputs[k + "_fine"] = v
        return outputs

    def probe_chunk(self, ref: Dict[str, jnp.ndarray],
                    que: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """Per-ray emptiness score: the COARSE network pass at
        ``probe_sample_num`` (< depth_sample_num) samples, scored as
        the per-ray sum of the aggregated hit probability [qn, rn].

        The score must come from the aggregation net: emptiness is a
        cross-view-consistency property, and per-view dist-decoder hit
        mass telescopes to ~1 along ANY query ray (each reference
        ray's mixture puts its surface somewhere in the sampled
        range), so a decoder-only probe cannot separate empty from
        occupied rays — measured on trained weights with
        tools/diag_probe_score.py: decoder-only scores cluster at 1.0
        for both classes. This probe reuses the coarse agg_net params;
        the ray-attention positional table is strided (pos_stride) so
        probe sample j sits at the position of full-coarse sample
        j*stride.

        Cost scales with probe_sample_num/depth_sample_num: 1/4 of the
        coarse gather taps (the measured frame floor) and ~1/4 of the
        aggregation at the default 16 — the score phase of the
        three-phase skip render (render_frame_probe_skip)."""
        c = self.cfg
        qn, rn, _ = que["coords"].shape
        que_depth, _ = S.sample_depth(
            que["depth_range"], qn, rn, c.probe_sample_num, False)
        que_dists = S.depth2inv_dists(que_depth, que["depth_range"])
        que_pts, que_dir = G.depth2points(
            que["coords"], que["poses"], que["Ks"], que_depth)
        prj = self._project_and_gather(ref, que_pts)
        prj = self._predict_proj_ray_prob(
            prj, ref["depth_range"], que_dists, False)
        stride = max(1, c.depth_sample_num // c.probe_sample_num)
        density, _ = self.agg_net(prj, que_dir, pos_stride=stride)
        alpha = 1.0 - jnp.exp(-nn.relu(density))
        hit_prob = alpha_values2hit_prob(alpha)
        return jnp.sum(hit_prob, -1)                          # qn,rn

    def probe_chunk_focus(self, ref: Dict[str, jnp.ndarray],
                          que: Dict[str, jnp.ndarray]):
        """Emptiness probe that ALSO localizes each ray's hit mass.

        Same network pass as probe_chunk, but besides the per-ray score
        it returns a narrowed per-ray depth window [near', far'] — the
        probe samples bracketing the [q, 1-q] quantiles of the ray's
        aggregated hit mass, padded by ``focus_margin`` probe bins.
        Rays with negligible probe mass (< 1e-3, e.g. empty or
        dilated-in rays) keep the full scene range, so downstream
        focused sampling degrades gracefully to strided full-range
        sampling instead of collapsing onto a garbage interval.

        Returns (score [qn,rn], near [qn,rn], far [qn,rn]).
        """
        c = self.cfg
        qn, rn, _ = que["coords"].shape
        que_depth, _ = S.sample_depth(
            que["depth_range"], qn, rn, c.probe_sample_num, False)
        que_dists = S.depth2inv_dists(que_depth, que["depth_range"])
        que_pts, que_dir = G.depth2points(
            que["coords"], que["poses"], que["Ks"], que_depth)
        prj = self._project_and_gather(ref, que_pts)
        prj = self._predict_proj_ray_prob(
            prj, ref["depth_range"], que_dists, False)
        stride = max(1, c.depth_sample_num // c.probe_sample_num)
        density, _ = self.agg_net(prj, que_dir, pos_stride=stride)
        alpha = 1.0 - jnp.exp(-nn.relu(density))
        hit_prob = alpha_values2hit_prob(alpha)               # qn,rn,pn
        hit_prob = hit_prob.astype(jnp.float32)
        score = jnp.sum(hit_prob, -1)

        pn = c.probe_sample_num
        # inclusive prefix sum over the tiny pn axis (triangular matmul:
        # jnp.cumsum is a pn-step sequential scan on TPU)
        tri = (jnp.arange(pn)[:, None] <= jnp.arange(pn)[None, :]).astype(
            jnp.float32)
        cdf = jnp.matmul(hit_prob, tri,
                         precision=jax.lax.Precision.HIGHEST)
        frac = cdf / (score[..., None] + 1e-12)
        q = c.focus_quantile
        idx = jnp.arange(pn)
        lo_idx = jnp.argmax(frac >= q, axis=-1)               # first >= q
        hi_idx = jnp.argmax(frac >= 1.0 - q, axis=-1)
        lo = jnp.clip(lo_idx - c.focus_margin, 0, pn - 1)
        hi = jnp.clip(hi_idx + c.focus_margin, 0, pn - 1)
        onehot = lambda i: (idx == i[..., None]).astype(jnp.float32)
        near_f = jnp.sum(onehot(lo) * que_depth, -1)
        far_f = jnp.sum(onehot(hi) * que_depth, -1)
        near_full = jnp.broadcast_to(
            que["depth_range"][:, 0:1], (qn, rn))
        far_full = jnp.broadcast_to(
            que["depth_range"][:, 1:2], (qn, rn))
        confident = score > 1e-3
        near_f = jnp.where(confident, near_f, near_full)
        far_f = jnp.where(confident & (far_f > near_f), far_f, far_full)
        return score, near_f, far_f

    def render_chunk_focus(self, ref: Dict[str, jnp.ndarray],
                           que: Dict[str, jnp.ndarray],
                           near: jnp.ndarray, far: jnp.ndarray):
        """Coarse+fine render of one chunk inside PER-RAY depth windows
        (probe-focused eval path; no reference counterpart — the
        reference renders every ray at the full [near, far] range).

        The coarse pass runs ``focus_sample_num`` samples uniform in
        inverse depth across [near_i, far_i]; a window at w of the full
        inverse-depth range keeps full-render sample density whenever
        focus_sample_num >= depth_sample_num * w. The ray attention
        sees each sample's GEOMETRIC position in the full coarse grid
        (fractional sinusoid, ibrnet.sinusoid_pos_at) so features stay
        in the trained position distribution. The fine pass importance-
        resamples ``focus_fine_sample_num`` depths from the focused
        coarse CDF (rank-scaled positions — fine positions are rank-
        semantic in training, the surface sits mid-table wherever its
        depth is).
        """
        c = self.cfg
        qn, rn, _ = que["coords"].shape
        que_depth, _ = S.sample_depth_ranged(near, far, c.focus_sample_num)
        dr = que["depth_range"]
        inv_lo = (-1.0 / dr[:, 0])[:, None, None]
        inv_hi = (-1.0 / dr[:, 1])[:, None, None]
        t = (-1.0 / que_depth - inv_lo) / (inv_hi - inv_lo)
        pos_c = t * (c.depth_sample_num - 1)
        outputs = self._render_by_depth(
            que_depth, que, ref, False, False, pos=pos_c)

        if c.use_hierarchical_sampling:
            fine_depth = S.sample_fine_depth(
                que_depth, jax.lax.stop_gradient(outputs["hit_prob_nr"]),
                dr, c.focus_fine_sample_num, False, None)
            if c.fine_depth_use_all:
                fine_depth = jnp.sort(
                    jnp.concatenate([que_depth, fine_depth], -1), -1)
            nf = fine_depth.shape[-1]
            nf_full = (c.depth_sample_num + c.fine_depth_sample_num
                       if c.fine_depth_use_all else c.fine_depth_sample_num)
            pos_f = jnp.linspace(0.0, float(nf_full - 1), nf)
            pos_f = jnp.broadcast_to(pos_f[None, None], (qn, rn, nf))
            fine_out = self._render_by_depth(
                fine_depth, que, ref, False, True, pos=pos_f)
            for k, v in fine_out.items():
                outputs[k + "_fine"] = v
        return outputs

    def render_chunk_fine(self, ref: Dict[str, jnp.ndarray],
                          que: Dict[str, jnp.ndarray],
                          hit_prob_nr: jnp.ndarray):
        """Fine pass ONLY, for rays whose coarse hit_prob is already
        known (eval path). Numerically identical to the fine half of
        render_chunk(is_train=False): the deterministic coarse depths
        are recomputed, fine depths come from CDF inversion of the
        given coarse hit_prob. Used by the two-phase empty-ray-skipping
        driver (render_frame_skip_empty)."""
        c = self.cfg
        qn, rn, _ = que["coords"].shape
        que_depth, _ = S.sample_depth(
            que["depth_range"], qn, rn, c.depth_sample_num, False)
        fine_depth = S.sample_fine_depth(
            que_depth, hit_prob_nr, que["depth_range"],
            c.fine_depth_sample_num, False, None)
        if c.fine_depth_use_all:
            fine_depth = jnp.sort(
                jnp.concatenate([que_depth, fine_depth], -1), -1)
        fine_out = self._render_by_depth(fine_depth, que, ref, False, True)
        return {k + "_fine": v for k, v in fine_out.items()}

    # ---------------- depth-loss head ----------------

    def predict_mean_for_depth_loss(self, ray_feats, coords, h: int, w: int):
        """Decode dist means at sampled ref-image coords for the depth loss
        (reference renderer.py:280-316). ray_feats [rfn,fh,fw,f];
        coords [rfn,pn,2] -> dict of [rfn,pn] arrays."""
        mask = jnp.ones(coords.shape[:2], jnp.float32)
        feats = interpolate_feature_map(ray_feats, coords, mask, h, w)
        mean = self.dist_decoder.predict_mean(feats)
        outputs = {"depth_mean": mean[..., 0], "depth_mean_2": mean[..., 1]}
        if self.cfg.use_hierarchical_sampling:
            mean_fine = self.fine_dist_decoder.predict_mean(feats)
            outputs["depth_mean_fine"] = mean_fine[..., 0]
            outputs["depth_mean_fine_2"] = mean_fine[..., 1]
        return outputs

    # ---------------- training forward ----------------

    def __call__(self, ref: Dict[str, jnp.ndarray],
                 que: Dict[str, jnp.ndarray], is_train: bool = True,
                 depth_loss_coords: Optional[jnp.ndarray] = None,
                 src: Optional[Dict[str, jnp.ndarray]] = None):
        """Full generalization forward: init -> encode -> render one chunk.
        (reference renderer.py:268-270, 318-327)."""
        ray_feats_raw = self.initialize_ray_feats(ref, src, is_train)
        img_feats, ray_feats = self.encode_scene(ref, ray_feats_raw)
        ref = dict(ref)
        ref["img_feats"] = img_feats
        ref["ray_feats"] = ray_feats
        ref = self.build_gather_cache(ref)
        outputs = self.render_chunk(ref, que, is_train)
        if depth_loss_coords is not None:
            h, w = ref["imgs"].shape[1:3]
            outputs.update(self.predict_mean_for_depth_loss(
                ray_feats, depth_loss_coords, h, w))
            outputs["depth_coords"] = depth_loss_coords
        return outputs


def chunk_coords(coords: jnp.ndarray, chunk: int):
    """Pad [qn, rn, 2] coords to a multiple of ``chunk`` and reshape to
    [n_chunks, qn, chunk, 2]. Returns (chunks, valid_rn)."""
    qn, rn, _ = coords.shape
    n_chunks = -(-rn // chunk)
    pad = n_chunks * chunk - rn
    coords = jnp.pad(coords, ((0, 0), (0, pad), (0, 0)), mode="edge")
    chunks = coords.reshape(qn, n_chunks, chunk, 2).transpose(1, 0, 2, 3)
    return chunks, rn


_DEFAULT_KEEP = ("pixel_colors_nr", "pixel_colors_nr_fine",
                 "pixel_colors_dr", "pixel_colors_dr_fine",
                 "render_depth", "render_depth_fine", "ray_mask")

_RENDER_FN_CACHE: dict = {}


def make_scene_encode_fn(renderer: NeurayRenderer):
    """Jitted scene-encoding function: (params, ref, src) -> ref dict
    augmented with img_feats / ray_feats / the fused gather map.

    Split out of the render program so callers rendering many ray
    segments (or many poses) of the SAME scene pay the conv encoders
    and gather-map build once, not once per device call (the reference
    re-encodes per render call, renderer.py:228-236 — here the split
    is free because the encoded ref is an explicit pytree).
    """
    cache_key = (renderer.cfg, "encode")
    if cache_key in _RENDER_FN_CACHE:
        return _RENDER_FN_CACHE[cache_key]

    def impl(params, ref, src=None):
        ray_feats_raw = renderer.apply(
            params, ref, src, method=NeurayRenderer.initialize_ray_feats)
        img_feats, ray_feats = renderer.apply(
            params, ref, ray_feats_raw, method=NeurayRenderer.encode_scene)
        ref_c = dict(ref)
        ref_c["img_feats"] = img_feats
        ref_c["ray_feats"] = ray_feats
        return renderer.build_gather_cache(ref_c)

    fn = jax.jit(impl)
    _RENDER_FN_CACHE[cache_key] = fn
    return fn


def make_ray_render_fn(renderer: NeurayRenderer, keep_keys=_DEFAULT_KEEP):
    """Jitted chunked ray-loop over an ALREADY-ENCODED ref (from
    make_scene_encode_fn): (params, ref_encoded, que) -> outputs."""
    cache_key = (renderer.cfg, tuple(keep_keys), "rays")
    if cache_key in _RENDER_FN_CACHE:
        return _RENDER_FN_CACHE[cache_key]
    c = renderer.cfg

    def impl(params, ref_c, que):
        chunks, rn = chunk_coords(que["coords"], c.ray_batch_num)

        def render_one(coords_chunk):
            que_c = dict(que)
            que_c["coords"] = coords_chunk
            out = renderer.apply(params, ref_c, que_c, False,
                                 method=NeurayRenderer.render_chunk)
            return {k: v for k, v in out.items() if k in keep_keys}

        outs = jax.lax.map(render_one, chunks)
        outs = jax.tree.map(
            lambda x: x.transpose(1, 0, *range(2, x.ndim)).reshape(
                x.shape[1], -1, *x.shape[3:])[:, :rn], outs)
        return outs

    fn = jax.jit(impl)
    _RENDER_FN_CACHE[cache_key] = fn
    return fn


def make_coarse_render_fn(renderer: NeurayRenderer,
                          keep_keys=("pixel_colors_nr", "hit_prob_nr")):
    """Jitted chunked COARSE-ONLY loop over an encoded ref: returns the
    coarse outputs incl. hit_prob_nr (device-resident) for the
    two-phase empty-ray-skipping render."""
    cache_key = (renderer.cfg, tuple(keep_keys), "coarse")
    if cache_key in _RENDER_FN_CACHE:
        return _RENDER_FN_CACHE[cache_key]
    c = renderer.cfg

    def impl(params, ref_c, que):
        chunks, rn = chunk_coords(que["coords"], c.ray_batch_num)

        def render_one(coords_chunk):
            que_c = dict(que)
            que_c["coords"] = coords_chunk
            qn, rnc, _ = coords_chunk.shape
            que_depth, _ = S.sample_depth(
                que_c["depth_range"], qn, rnc, c.depth_sample_num, False)
            out = renderer.apply(
                params, que_depth, que_c, ref_c, False, False,
                method=NeurayRenderer._render_by_depth)
            return {k: v for k, v in out.items() if k in keep_keys}

        outs = jax.lax.map(render_one, chunks)
        return jax.tree.map(
            lambda x: x.transpose(1, 0, *range(2, x.ndim)).reshape(
                x.shape[1], -1, *x.shape[3:])[:, :rn], outs)

    fn = jax.jit(impl)
    _RENDER_FN_CACHE[cache_key] = fn
    return fn


def make_fine_render_fn(renderer: NeurayRenderer,
                        keep_keys=("pixel_colors_nr_fine",)):
    """Jitted chunked FINE-ONLY loop: (params, ref_c, que_kept,
    hit_prob_kept) -> fine outputs for the kept rays."""
    cache_key = (renderer.cfg, tuple(keep_keys), "fine")
    if cache_key in _RENDER_FN_CACHE:
        return _RENDER_FN_CACHE[cache_key]
    c = renderer.cfg

    def impl(params, ref_c, que, hit_prob):
        chunks, rn = chunk_coords(que["coords"], c.ray_batch_num)
        qn = que["coords"].shape[0]
        n_chunks = chunks.shape[0]
        pad = n_chunks * c.ray_batch_num - hit_prob.shape[1]
        hp = jnp.pad(hit_prob, ((0, 0), (0, pad), (0, 0)), mode="edge")
        hp = hp.reshape(qn, n_chunks, c.ray_batch_num, -1).transpose(
            1, 0, 2, 3)

        def render_one(args):
            coords_chunk, hp_chunk = args
            que_c = dict(que)
            que_c["coords"] = coords_chunk
            out = renderer.apply(
                params, ref_c, que_c, hp_chunk,
                method=NeurayRenderer.render_chunk_fine)
            return {k: v for k, v in out.items() if k in keep_keys}

        outs = jax.lax.map(render_one, (chunks, hp))
        return jax.tree.map(
            lambda x: x.transpose(1, 0, *range(2, x.ndim)).reshape(
                x.shape[1], -1, *x.shape[3:])[:, :rn], outs)

    fn = jax.jit(impl)
    _RENDER_FN_CACHE[cache_key] = fn
    return fn


def make_probe_fn(renderer: NeurayRenderer):
    """Jitted chunked emptiness-probe loop over an encoded ref:
    (params, ref_c, que) -> per-ray score [qn, rn]."""
    cache_key = (renderer.cfg, "probe")
    if cache_key in _RENDER_FN_CACHE:
        return _RENDER_FN_CACHE[cache_key]
    c = renderer.cfg

    def impl(params, ref_c, que):
        chunks, rn = chunk_coords(que["coords"], c.ray_batch_num)

        def probe_one(coords_chunk):
            que_c = dict(que)
            que_c["coords"] = coords_chunk
            return renderer.apply(params, ref_c, que_c,
                                  method=NeurayRenderer.probe_chunk)

        scores = jax.lax.map(probe_one, chunks)   # n_chunks, qn, chunk
        return scores.transpose(1, 0, 2).reshape(
            scores.shape[1], -1)[:, :rn]

    fn = jax.jit(impl)
    _RENDER_FN_CACHE[cache_key] = fn
    return fn


def make_focus_probe_fn(renderer: NeurayRenderer):
    """Jitted chunked focus-probe loop over an encoded ref:
    (params, ref_c, que) -> (score, near, far), each [qn, rn]."""
    cache_key = (renderer.cfg, "focus_probe")
    if cache_key in _RENDER_FN_CACHE:
        return _RENDER_FN_CACHE[cache_key]
    c = renderer.cfg

    def impl(params, ref_c, que):
        chunks, rn = chunk_coords(que["coords"], c.ray_batch_num)

        def probe_one(coords_chunk):
            que_c = dict(que)
            que_c["coords"] = coords_chunk
            return renderer.apply(params, ref_c, que_c,
                                  method=NeurayRenderer.probe_chunk_focus)

        outs = jax.lax.map(probe_one, chunks)  # 3 x [n_chunks, qn, chunk]
        unchunk = lambda x: x.transpose(1, 0, 2).reshape(
            x.shape[1], -1)[:, :rn]
        return tuple(unchunk(x) for x in outs)

    fn = jax.jit(impl)
    _RENDER_FN_CACHE[cache_key] = fn
    return fn


def make_focus_render_fn(renderer: NeurayRenderer, keep_keys=_DEFAULT_KEEP):
    """Jitted chunked FOCUSED coarse+fine loop: (params, ref_c, que,
    near, far) -> outputs, where near/far [qn, rn] are the per-ray
    windows from make_focus_probe_fn."""
    cache_key = (renderer.cfg, tuple(keep_keys), "focus")
    if cache_key in _RENDER_FN_CACHE:
        return _RENDER_FN_CACHE[cache_key]
    c = renderer.cfg

    def impl(params, ref_c, que, near, far):
        chunks, rn = chunk_coords(que["coords"], c.ray_batch_num)
        qn = que["coords"].shape[0]
        n_chunks = chunks.shape[0]

        def chunk_rows(x):  # [qn, rn] -> [n_chunks, qn, chunk]
            pad = n_chunks * c.ray_batch_num - x.shape[1]
            x = jnp.pad(x, ((0, 0), (0, pad)), mode="edge")
            return x.reshape(qn, n_chunks, c.ray_batch_num).transpose(
                1, 0, 2)

        def render_one(args):
            coords_chunk, near_chunk, far_chunk = args
            que_c = dict(que)
            que_c["coords"] = coords_chunk
            out = renderer.apply(
                params, ref_c, que_c, near_chunk, far_chunk,
                method=NeurayRenderer.render_chunk_focus)
            return {k: v for k, v in out.items() if k in keep_keys}

        outs = jax.lax.map(
            render_one, (chunks, chunk_rows(near), chunk_rows(far)))
        return jax.tree.map(
            lambda x: x.transpose(1, 0, *range(2, x.ndim)).reshape(
                x.shape[1], -1, *x.shape[3:])[:, :rn], outs)

    fn = jax.jit(impl)
    _RENDER_FN_CACHE[cache_key] = fn
    return fn


def _dilate_keep_mask(keep_mask, image_hw, dilate: int):
    """Host-side iterated 8-neighbour (3x3 max) dilation of a row-major
    full-image keep mask. keep_mask [rn] bool -> [rn] bool."""
    h, w = image_hw
    m = keep_mask.reshape(h, w)
    for _ in range(dilate):
        g = m.copy()
        g[1:] |= m[:-1]
        g[:-1] |= m[1:]
        g[:, 1:] |= m[:, :-1]
        g[:, :-1] |= m[:, 1:]
        g[1:, 1:] |= m[:-1, :-1]
        g[1:, :-1] |= m[:-1, 1:]
        g[:-1, 1:] |= m[1:, :-1]
        g[:-1, :-1] |= m[1:, 1:]
        m = g
    return m.reshape(-1)


def _strided_focus_probe(probe_fn, params, ref_c, que, threshold: float,
                         image_hw, stride: int):
    """Run the focus probe on a 1/stride^2 pixel subgrid and upsample
    conservatively (see render_frame_probe_focus's probe_stride doc).
    Returns (keep_mask [rn] bool, near [1, rn] np, far [1, rn] np)."""
    import numpy as np

    h, w = image_hw
    ys, xs = np.arange(0, h, stride), np.arange(0, w, stride)
    hs, ws = ys.size, xs.size
    sub_idx = (ys[:, None] * w + xs[None, :]).reshape(-1)
    que_p = dict(que)
    que_p["coords"] = jnp.take(
        que["coords"], jnp.asarray(sub_idx), axis=1)
    score_d, near_d, far_d = probe_fn(params, ref_c, que_p)
    near_s = np.asarray(jax.device_get(near_d),
                        np.float32)[0].reshape(hs, ws)
    far_s = np.asarray(jax.device_get(far_d),
                       np.float32)[0].reshape(hs, ws)
    score_s = np.asarray(jax.device_get(score_d))[0].reshape(hs, ws)

    def pool3(a, op):
        p = np.pad(a, 1, mode="edge")
        return op(np.stack([p[i:i + hs, j:j + ws]
                            for i in range(3) for j in range(3)]),
                  axis=0)

    near_s = pool3(near_s, np.min)
    far_s = pool3(far_s, np.max)
    keep_s = _dilate_keep_mask(
        (score_s > threshold).reshape(-1), (hs, ws), 1)
    yi = np.minimum(np.arange(h) // stride, hs - 1)
    xi = np.minimum(np.arange(w) // stride, ws - 1)
    keep_mask = keep_s.reshape(hs, ws)[
        yi[:, None], xi[None, :]].reshape(-1)
    near = near_s[yi[:, None], xi[None, :]].reshape(1, -1)
    far = far_s[yi[:, None], xi[None, :]].reshape(1, -1)
    return keep_mask, near, far


def _merge_kept_outputs(keep_base, kept_out, keep, keep_mask, qn, rn):
    """Scatter kept-ray outputs back into full-frame arrays (zeros on
    skipped rays). With nothing kept, the per-key trailing shape is
    taken from a name map (colors 3-channel, render_depth per-ray) —
    the kept path derives it from the actual outputs."""
    import numpy as np

    out = {"kept_rays": int(keep.size), "keep_mask": keep_mask}
    tails = {"render_depth": ()}
    for k in keep_base:
        for suffix in ("", "_fine"):
            if kept_out is not None:
                vals = np.asarray(
                    jax.device_get(kept_out[k + suffix]), np.float32)
                full = np.zeros((qn, rn) + vals.shape[2:], np.float32)
                full[0, keep] = vals[0, :keep.size]
            else:
                full = np.zeros((qn, rn) + tails.get(k, (3,)),
                                np.float32)
            out[k + suffix] = full
    return out


def render_frame_probe_focus(renderer: NeurayRenderer, params, ref_c,
                             que, threshold: float = 0.005,
                             bucket_chunks: int = 32,
                             keep_base=("pixel_colors_nr",),
                             image_hw=None, dilate: int = 0,
                             mesh=None, probe_out=None,
                             probe_stride: int = 1):
    """THREE-phase eval render with FOCUSED sampling: the probe both
    scores every ray (skip decision, as render_frame_probe_skip) and
    narrows each kept ray's depth window; the kept rays then render
    coarse+fine at focus_sample_num/focus_fine_sample_num samples
    inside their windows. vs probe_skip the kept rays are no longer
    bit-identical to the full render — they are sampled DENSER across
    the surface interval at fewer taps, so quality is a measured
    property (tools/check_skip_quality.py --focus), not an identity.

    This is the mode that pays on fully-occupied (forward-facing)
    scenes, where ray skipping finds nothing to skip but windows are
    narrow: per-ray samples drop from depth+fine(+use_all) to
    probe+focus+focus_fine(+use_all).

    probe_out: optional precomputed probe result, reused by the
    self-validating driver (render_frame_probe_auto) so the probe runs
    once per frame: with probe_stride == 1 the (score_d, near_d,
    far_d) tuple from make_focus_probe_fn; with probe_stride > 1 the
    (keep_mask, near, far) tuple from _strided_focus_probe.

    probe_stride: probe every stride-th pixel in x and y (requires
    ``image_hw``; full-image row-major rays) — cuts the probe's taps
    by stride^2, now the dominant tap cost of the focused frame. The
    full-resolution rays inherit CONSERVATIVE windows from the probe
    grid: 3x3 neighborhood min(near)/max(far) pooling at probe
    resolution, and the keep decision is dilated by 1 probe pixel
    before nearest-upsampling (a silhouette falling between probe
    pixels lands in a kept, full-range-padded neighbor window).
    """
    import numpy as np

    c = renderer.cfg
    assert c.use_hierarchical_sampling
    keep_base = tuple(keep_base)
    keep_keys = keep_base + tuple(k + "_fine" for k in keep_base)
    if mesh is not None and mesh.devices.size > 1:
        from neuray_tpu.parallel.sharding import (
            make_sharded_focus_probe_fn, make_sharded_focus_render_fn)
        probe_fn = make_sharded_focus_probe_fn(renderer, mesh)
        rays_fn = make_sharded_focus_render_fn(
            renderer, mesh, keep_keys=keep_keys)
    else:
        probe_fn = make_focus_probe_fn(renderer)
        rays_fn = make_focus_render_fn(renderer, keep_keys=keep_keys)

    qn, rn, _ = que["coords"].shape
    assert qn == 1, "skip-empty driver is per-query-view"
    if probe_stride > 1:
        assert image_hw is not None
        keep_mask, near_d, far_d = (
            probe_out if probe_out is not None
            else _strided_focus_probe(probe_fn, params, ref_c, que,
                                      threshold, image_hw, probe_stride))
    else:
        score_d, near_d, far_d = (probe_out if probe_out is not None
                                  else probe_fn(params, ref_c, que))
        score = np.asarray(jax.device_get(score_d))
        keep_mask = score[0] > threshold
    if dilate > 0 and image_hw is not None:
        keep_mask = _dilate_keep_mask(keep_mask, image_hw, dilate)
    keep = np.nonzero(keep_mask)[0]
    kept_out = None
    if keep.size:
        chunk = c.ray_batch_num
        ceil = lambda a, b: -(-a // b)
        total_chunks = ceil(rn, chunk)
        bucket = min(bucket_chunks, total_chunks)
        n_chunks = min(ceil(ceil(keep.size, chunk), bucket) * bucket,
                       total_chunks)
        k_pad = n_chunks * chunk
        keep_padded = np.pad(keep, (0, k_pad - keep.size), mode="edge") \
            if k_pad > keep.size else keep[:k_pad]
        kidx = jnp.asarray(keep_padded)
        que_k = dict(que)
        que_k["coords"] = jnp.take(que["coords"], kidx, axis=1)
        if isinstance(near_d, np.ndarray):   # host windows (probe_stride)
            near_k = jnp.asarray(near_d[:, keep_padded])
            far_k = jnp.asarray(far_d[:, keep_padded])
        else:
            near_k = jnp.take(near_d, kidx, axis=1)
            far_k = jnp.take(far_d, kidx, axis=1)
        kept_out = rays_fn(params, ref_c, que_k, near_k, far_k)
    return _merge_kept_outputs(keep_base, kept_out, keep, keep_mask,
                               qn, rn)


def render_frame_probe_skip(renderer: NeurayRenderer, params, ref_c,
                            que, threshold: float = 0.005,
                            bucket_chunks: int = 32,
                            keep_base=("pixel_colors_nr",),
                            image_hw=None, dilate: int = 0,
                            mesh=None, probe_out=None):
    """THREE-phase eval render: a cheap probe scores every ray, then
    the full coarse+fine program runs ONLY on rays the probe kept;
    skipped rays output the empty-ray background (zeros — compositing
    has no background term, so an empty ray's rendered color is the
    all-miss integral ~0).

    vs render_frame_skip_empty (two-phase): the coarse pass there still
    pays all rays at depth_sample_num samples + the full aggregation
    net (measured 60% of the frame, tools/profile_skip_phases.py); the
    probe costs probe_sample_num/depth_sample_num of the coarse taps
    and no aggregation. Kept rays remain BIT-IDENTICAL to the full
    render (the kept set is decided host-side; per-ray math does not
    change). Probe-vs-network keep-set mismatch is the quality risk —
    quantified per threshold in tools/check_skip_quality.py --probe.

    The reduced-sample probe can miss thin-silhouette rays; for
    full-image queries pass ``image_hw=(h, w)`` (row-major rays) and
    ``dilate=d`` to grow the keep mask by d pixels (host-side 3x3 max
    filter, iterated) — the conservative fix: a ring of extra kept
    rays instead of missed surface pixels.

    Returns, per key k in keep_base: ``k`` (coarse; zeros for skipped
    rays) and ``k + "_fine"`` (fine for kept, zeros for skipped), plus
    ``kept_rays``; arrays are numpy.
    """
    import numpy as np

    c = renderer.cfg
    assert c.use_hierarchical_sampling
    keep_base = tuple(keep_base)
    keep_keys = keep_base + tuple(k + "_fine" for k in keep_base)
    if mesh is not None and mesh.devices.size > 1:
        # multi-chip: probe and kept phase both shard the ray axis
        # (parallel/sharding.py; verified == unsharded on the virtual
        # CPU mesh, tests/test_parallel.py)
        from neuray_tpu.parallel.sharding import (
            make_sharded_probe_fn, make_sharded_render_fn)
        probe_fn = make_sharded_probe_fn(renderer, mesh)
        rays_fn = make_sharded_render_fn(
            renderer, mesh, keep_keys=keep_keys, pre_encoded=True)
    else:
        probe_fn = make_probe_fn(renderer)
        rays_fn = make_ray_render_fn(renderer, keep_keys=keep_keys)

    score = np.asarray(jax.device_get(
        probe_out if probe_out is not None
        else probe_fn(params, ref_c, que)))

    qn, rn, _ = que["coords"].shape
    assert qn == 1, "skip-empty driver is per-query-view"
    keep_mask = score[0] > threshold
    if dilate > 0 and image_hw is not None:
        keep_mask = _dilate_keep_mask(keep_mask, image_hw, dilate)
    keep = np.nonzero(keep_mask)[0]
    kept_out = None
    if keep.size:
        chunk = c.ray_batch_num
        ceil = lambda a, b: -(-a // b)
        total_chunks = ceil(rn, chunk)
        bucket = min(bucket_chunks, total_chunks)
        n_chunks = min(ceil(ceil(keep.size, chunk), bucket) * bucket,
                       total_chunks)
        k_pad = n_chunks * chunk
        keep_padded = np.pad(keep, (0, k_pad - keep.size), mode="edge") \
            if k_pad > keep.size else keep[:k_pad]
        que_k = dict(que)
        que_k["coords"] = jnp.take(
            que["coords"], jnp.asarray(keep_padded), axis=1)
        kept_out = rays_fn(params, ref_c, que_k)
    return _merge_kept_outputs(keep_base, kept_out, keep, keep_mask,
                               qn, rn)


def render_frame_skip_empty(renderer: NeurayRenderer, params, ref_c,
                            que, threshold: float = 0.02,
                            bucket_chunks: int = 32,
                            keep_base=("pixel_colors_nr",),
                            mesh=None):
    """Two-phase eval render that SKIPS the fine pass for rays whose
    coarse pass found nothing (sum of coarse hit_prob <= threshold).

    Gather taps are the measured frame-time floor (~20ns/tap,
    docs/ARCHITECTURE.md roofline) and the fine pass costs 2/3 of them
    (128 of 192 samples with fine_depth_use_all); on object-centric
    scenes most rays hit only background, so their fine pass
    contributes nothing visible — their fine output is replaced by the
    coarse estimate of the same integral. Kept rays are BIT-IDENTICAL
    to the single-phase render (same per-ray math; chunk membership
    does not change numerics). Quality vs threshold is quantified in
    tools/check_skip_quality.py.

    Kept-ray counts are padded up to ``bucket_chunks``-chunk multiples:
    a fixed small set of fine-program shapes (few compiles) with at
    most bucket_chunks*ray_batch_num rays of padded duplicate work.

    The coarse image readback is dispatched AFTER the fine call so the
    (slow, ~20MB/s on this box) device->host transfer overlaps fine
    compute; only the per-ray score (4B/ray) is fetched eagerly.

    For every key ``k`` in ``keep_base`` (coarse outputs — e.g.
    pixel_colors_nr, render_depth, pixel_colors_dr) the result carries
    ``k`` (full coarse) and ``k + "_fine"`` (fine for kept rays, coarse
    estimate for skipped rays), plus ``kept_rays``; arrays are numpy.
    """
    import numpy as np

    c = renderer.cfg
    assert c.use_hierarchical_sampling
    keep_base = tuple(keep_base)
    if mesh is not None and mesh.devices.size > 1:
        # multi-chip: both the exact coarse gate and the kept fine pass
        # shard the ray axis; the compaction between them stays
        # host-side (parallel/sharding.py; == unsharded on the virtual
        # CPU mesh, tests/test_parallel.py)
        from neuray_tpu.parallel.sharding import (
            make_sharded_coarse_render_fn, make_sharded_fine_render_fn)
        coarse_fn = make_sharded_coarse_render_fn(
            renderer, mesh, keep_keys=keep_base + ("hit_prob_nr",))
        fine_fn = make_sharded_fine_render_fn(
            renderer, mesh,
            keep_keys=tuple(k + "_fine" for k in keep_base))
    else:
        coarse_fn = make_coarse_render_fn(
            renderer, keep_keys=keep_base + ("hit_prob_nr",))
        fine_fn = make_fine_render_fn(
            renderer, keep_keys=tuple(k + "_fine" for k in keep_base))

    coarse = coarse_fn(params, ref_c, que)
    hit_prob = coarse["hit_prob_nr"]          # device-resident [qn,rn,dn]
    score = np.asarray(jax.device_get(jnp.sum(hit_prob, -1)))  # qn,rn

    qn, rn, _ = que["coords"].shape
    assert qn == 1, "skip-empty driver is per-query-view"
    keep_mask = score[0] > threshold
    keep = np.nonzero(keep_mask)[0]
    fine = None
    if keep.size:
        chunk = c.ray_batch_num
        ceil = lambda a, b: -(-a // b)
        total_chunks = ceil(rn, chunk)
        bucket = min(bucket_chunks, total_chunks)
        n_chunks = min(ceil(ceil(keep.size, chunk), bucket) * bucket,
                       total_chunks)
        k_pad = n_chunks * chunk
        keep_padded = np.pad(keep, (0, k_pad - keep.size), mode="edge") \
            if k_pad > keep.size else keep[:k_pad]
        kp = jnp.asarray(keep_padded)
        que_k = dict(que)
        que_k["coords"] = jnp.take(que["coords"], kp, axis=1)
        hp_k = jnp.take(hit_prob, kp, axis=1)
        fine = fine_fn(params, ref_c, que_k, hp_k)  # async dispatch
    out = {"kept_rays": int(keep.size), "keep_mask": keep_mask}
    for k in keep_base:
        base = np.asarray(jax.device_get(coarse[k]), np.float32)
        merged = base.copy()  # skipped rays: coarse estimate
        if fine is not None:
            fine_np = np.asarray(
                jax.device_get(fine[k + "_fine"]), np.float32)
            merged[0, keep] = fine_np[0, :keep.size]
        out[k] = base
        out[k + "_fine"] = merged
    return out


def estimate_false_skip(renderer: NeurayRenderer, params, ref_c, que,
                        skip_idx, threshold: float,
                        sample_rays: int = 2048, seed: int = 0):
    """Audit the probe's skip decision: run the EXACT gate (the full
    depth_sample_num coarse pass, the same score the two-phase driver
    thresholds) on a random sample of the rays the probe skipped, and
    return the fraction the exact gate would have KEPT.

    This is the probe's measurable failure mode — a reduced-sample
    probe stepping over thin structures (measured: the 8-sample probe
    on the multi-blob scene, docs/ARCHITECTURE.md). Cost: ~sample_rays
    rays of coarse-only work (~0.3% of a frame at the bench shape).
    """
    import numpy as np

    if skip_idx.size == 0:
        return 0.0
    rs = np.random.RandomState(seed)
    pick = (skip_idx if skip_idx.size <= sample_rays
            else rs.choice(skip_idx, sample_rays, replace=False))
    chunk = renderer.cfg.ray_batch_num
    n = -(-pick.size // chunk) * chunk
    pick_p = np.pad(pick, (0, n - pick.size), mode="edge")
    que_s = dict(que)
    que_s["coords"] = jnp.take(que["coords"], jnp.asarray(pick_p), axis=1)
    coarse_fn = make_coarse_render_fn(renderer, keep_keys=("hit_prob_nr",))
    hp = np.asarray(jax.device_get(
        coarse_fn(params, ref_c, que_s)["hit_prob_nr"]))
    exact_score = hp[0, :pick.size].sum(-1)
    return float((exact_score > threshold).mean())


def estimate_window_clip(renderer: NeurayRenderer, params, ref_c, que,
                         keep_idx, near, far, threshold: float,
                         sample_rays: int = 1024, seed: int = 0,
                         ref_psnr: float = 35.0):
    """Audit the probe's FOCUS WINDOWS against the exact full-sample
    coarse pass on a random sample of the KEPT rays, and PREDICT the
    image-level PSNR cost of the windows in dB.

    The focused render never samples outside its [near, far] window,
    so hit-probability mass outside the window is unrecoverable — the
    focus mode's quality failure mode on weakly-trained / diffuse
    models (measured: the full-coverage room scene loses ~0.8 dB while
    the false-SKIP audit reads 0.0, because every ray is kept).
    Complements estimate_false_skip: together the two audits cover
    both ways a probe-driven render can differ from the exact one.
    Cost: ~sample_rays rays of coarse-only work.

    Returns a dict:
      * ``clip_mass``: mean fraction of per-ray hit mass outside the
        window (rays whose exact mass is below ``threshold`` excluded
        — they would have been skipped). The round-3/4 proxy metric,
        kept for logging.
      * ``clip_db``: predicted PSNR loss in dB. Per audited ray the
        clipping-induced color error is computed EXACTLY from the
        coarse pass (d_i = composite over all samples minus composite
        over inside-window samples — per-sample radiance x hit prob),
        scaled to the image (x kept-ray fraction; skipped rays are the
        other audit's problem), and converted under the model
        mse_total ~= mse_ref + mse_clip (clipping error uncorrelated
        with the base render's GT error):
            clip_db = 10 log10(1 + mse_clip x kept_frac / mse_ref),
        with mse_ref = 10^(-ref_psnr/10). ``ref_psnr`` defaults to
        35 dB — above every scene measured on this box (17-34 dB), so
        the predicted loss is an overestimate wherever the real render
        is worse (conservative: over-predicting can only reject focus
        and fall back to the exact gate). Predicted-vs-realized is
        validated on the room scene in docs/ARCHITECTURE.md
        (tools/check_skip_quality.py --predict).
    """
    import numpy as np
    from neuray_tpu.ops import sampling as S

    if keep_idx.size == 0:
        return {"clip_mass": 0.0, "clip_db": 0.0}
    rs = np.random.RandomState(seed)
    pick = (keep_idx if keep_idx.size <= sample_rays
            else rs.choice(keep_idx, sample_rays, replace=False))
    chunk = renderer.cfg.ray_batch_num
    n = -(-pick.size // chunk) * chunk
    pick_p = np.pad(pick, (0, n - pick.size), mode="edge")
    que_s = dict(que)
    que_s["coords"] = jnp.take(que["coords"], jnp.asarray(pick_p), axis=1)
    coarse_fn = make_coarse_render_fn(
        renderer, keep_keys=("hit_prob_nr", "colors_nr"))
    out = coarse_fn(params, ref_c, que_s)
    hp = np.asarray(jax.device_get(
        out["hit_prob_nr"]))[0, :pick.size]                # n, dn
    cols = np.asarray(jax.device_get(
        out["colors_nr"]), np.float32)[0, :pick.size]      # n, dn, 3
    # the exact coarse depths are the deterministic stratified
    # inverse-depth grid — recompute host-side (ops/sampling)
    depth = np.asarray(jax.device_get(S.sample_depth(
        que["depth_range"], 1, pick.size,
        renderer.cfg.depth_sample_num, False)[0]))[0]      # n, dn
    nr = np.asarray(near)[0, pick][:, None]
    fr = np.asarray(far)[0, pick][:, None]
    inside = (depth >= nr) & (depth <= fr)
    mass = hp.sum(-1)
    mass_in = (hp * inside).sum(-1)
    valid = mass > threshold
    clip_mass = 0.0
    if valid.any():
        clip = 1.0 - mass_in[valid] / np.maximum(mass[valid], 1e-8)
        clip_mass = float(clip.mean())
    # predicted dB: exact composite vs inside-window composite
    e = np.einsum("nd,ndc->nc", hp, cols)
    f = np.einsum("nd,ndc->nc", hp * inside, cols)
    mse_clip = float(np.mean((e - f) ** 2))
    kept_frac = keep_idx.size / que["coords"].shape[1]
    mse_ref = 10.0 ** (-ref_psnr / 10.0)
    clip_db = float(10.0 * np.log10(
        1.0 + mse_clip * kept_frac / mse_ref))
    return {"clip_mass": clip_mass, "clip_db": clip_db}


def render_frame_probe_auto(renderer: NeurayRenderer, params, ref_c,
                            que, threshold: float = 0.005,
                            bucket_chunks: int = 32,
                            keep_base=("pixel_colors_nr",),
                            image_hw=None, dilate: int = 1,
                            focus: bool = False, mesh=None,
                            tol: float = 0.02,
                            max_probe_sample_num: int = 32,
                            validate_rays: int = 2048, seed: int = 0,
                            probe_stride: int = 1,
                            win_tol_db: float = 0.05,
                            win_ref_psnr: float = 35.0):
    """SELF-VALIDATING probe-skip/focus render — removes the
    scene-tuned probe_sample_num knob.

    A probe-driven render can fail two ways: skipping rays the exact
    gate would keep (thin silhouettes between probe samples), and —
    focus mode only — windows that clip real hit mass (diffuse /
    weakly trained models, where nothing skips so the skip audit alone
    is blind; measured on the full-coverage room scene,
    docs/ARCHITECTURE.md). This driver probes, AUDITS random samples
    against the exact full-sample coarse gate (estimate_false_skip on
    skipped rays; predicted window-clip PSNR cost <= win_tol_db dB on
    kept rays when ``focus`` — estimate_window_clip), and:
      - accepts the probe if the measured false-skip rate <= tol,
      - otherwise doubles probe_sample_num (recompiled probe variant;
        the encoded scene is reused) and re-audits,
      - past max_probe_sample_num, falls back to the exact two-phase
        driver (render_frame_skip_empty), whose gate cannot miss.

    Measured escalation behavior (800x800, trained bench weights,
    tol=0.02, threshold=0.01, dilate=1, focus=True, v5e-1): the
    single-sphere scene accepts 8 probe samples (audited false-skip
    0.54%; 194k rays/s amortized, GT-PSNR 26.63); the multi-blob scene
    with a thin r=0.08 sphere fails the audit at 8 AND at 16 and
    accepts 32 (final false-skip 0.39%, kept 11.4% == the exact gate's
    fraction, GT-PSNR 33.49 vs the full render's 33.37, 73.6k rays/s
    — still 2.1x the full render).

    Returns the frame dict plus: probe_sample_num (accepted value),
    false_skip_rate (last audit), fallback ("two_phase" or None),
    audit_trail (one {probe_sample_num, false_skip_rate,
    window_clip_db, kept_fraction} record per ladder rung — the
    rejected rungs' measured rates, not just the accepted one), and
    in focus mode window_clip (mass fraction) / window_clip_db
    (predicted PSNR cost, the gated value).
    """
    import numpy as np

    c = renderer.cfg
    psn = c.probe_sample_num
    use_stride = focus and probe_stride > 1 and image_hw is not None
    info = {"fallback": None, "audit_trail": []}
    # probe-fn builders: on a multi-device mesh the probe itself shards
    # the ray axis (parallel/sharding.py) so the escalation ladder runs
    # at mesh speed, matching the final render phase it gates
    if mesh is not None and mesh.devices.size > 1:
        from neuray_tpu.parallel.sharding import (
            make_sharded_probe_fn, make_sharded_focus_probe_fn)
        _focus_probe = lambda rr: make_sharded_focus_probe_fn(rr, mesh)
        _plain_probe = lambda rr: make_sharded_probe_fn(rr, mesh)
    else:
        _focus_probe = make_focus_probe_fn
        _plain_probe = make_probe_fn
    while True:
        r = (renderer if psn == c.probe_sample_num
             else NeurayRenderer(dataclasses.replace(
                 c, probe_sample_num=psn)))
        probe_out = None
        if use_stride:
            probe_out = _strided_focus_probe(
                _focus_probe(r), params, ref_c, que, threshold,
                image_hw, probe_stride)
            keep_mask = probe_out[0]
        else:
            if focus:
                probe_fn = _focus_probe(r)
                probe_out = probe_fn(params, ref_c, que)
                score_d = probe_out[0]
            else:
                probe_fn = _plain_probe(r)
                probe_out = probe_fn(params, ref_c, que)
                score_d = probe_out
            score = np.asarray(jax.device_get(score_d))
            keep_mask = score[0] > threshold
        if dilate > 0 and image_hw is not None:
            keep_mask = _dilate_keep_mask(keep_mask, image_hw, dilate)
        skip_idx = np.nonzero(~keep_mask)[0]
        fs = estimate_false_skip(r, params, ref_c, que, skip_idx,
                                 threshold, validate_rays, seed)
        info["false_skip_rate"] = fs
        info["probe_sample_num"] = psn
        wc_db = 0.0
        if focus and fs <= tol:
            # second audit, for the focus mode's OTHER failure mode:
            # windows clipping real hit mass (a diffuse / weakly
            # trained model — skipping audits can't see it because on
            # such scenes nothing skips). Uses the same exact coarse
            # gate, on KEPT rays.
            if use_stride:
                near_a, far_a = probe_out[1], probe_out[2]
            else:
                near_a = np.asarray(jax.device_get(probe_out[1]))
                far_a = np.asarray(jax.device_get(probe_out[2]))
            wc = estimate_window_clip(
                r, params, ref_c, que, np.nonzero(keep_mask)[0],
                near_a, far_a, threshold, seed=seed,
                ref_psnr=win_ref_psnr)
            info["window_clip"] = wc["clip_mass"]
            info["window_clip_db"] = wc_db = wc["clip_db"]
        info["audit_trail"].append({
            "probe_sample_num": psn,
            "false_skip_rate": fs,
            "window_clip_db": (wc_db if focus and fs <= tol else None),
            "kept_fraction": float(keep_mask.mean())})
        if fs <= tol and wc_db <= win_tol_db:
            if focus:
                out = render_frame_probe_focus(
                    r, params, ref_c, que, threshold=threshold,
                    bucket_chunks=bucket_chunks, keep_base=keep_base,
                    image_hw=image_hw, dilate=dilate, mesh=mesh,
                    probe_out=probe_out,
                    probe_stride=probe_stride if use_stride else 1)
            else:
                out = render_frame_probe_skip(
                    r, params, ref_c, que, threshold=threshold,
                    bucket_chunks=bucket_chunks, keep_base=keep_base,
                    image_hw=image_hw, dilate=dilate, mesh=mesh,
                    probe_out=probe_out)
            out.update(info)
            return out
        if psn * 2 > max_probe_sample_num:
            out = render_frame_skip_empty(
                renderer, params, ref_c, que, threshold=threshold,
                bucket_chunks=bucket_chunks, keep_base=keep_base,
                mesh=mesh)
            info["fallback"] = "two_phase"
            out.update(info)
            return out
        psn *= 2


def make_render_fn(renderer: NeurayRenderer, keep_keys=_DEFAULT_KEEP):
    """Build (and cache) the full render function: scene encode + the
    chunked ray loop (the TPU analog of the reference's python
    ray-batch loop, reference renderer.py:237-252), composed from
    make_scene_encode_fn and make_ray_render_fn as two jit programs."""
    cache_key = (renderer.cfg, tuple(keep_keys))
    if cache_key in _RENDER_FN_CACHE:
        return _RENDER_FN_CACHE[cache_key]
    encode_fn = make_scene_encode_fn(renderer)
    rays_fn = make_ray_render_fn(renderer, keep_keys)

    def fn(params, ref, que, src=None):
        return rays_fn(params, encode_fn(params, ref, src), que)

    _RENDER_FN_CACHE[cache_key] = fn
    return fn


def render_full(renderer: NeurayRenderer, params, ref, que, src=None,
                keep_keys=_DEFAULT_KEEP):
    """Convenience wrapper over make_render_fn."""
    return make_render_fn(renderer, keep_keys)(params, ref, que, src)
