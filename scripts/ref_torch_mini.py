"""Straight-line torch transcription of the reference's attention processors
and motion-block embedding plumbing — the REFERENCE-DERIVED golden generator
(no diffusers needed; pure torch math driven by flat state dicts).

Transcribed surfaces (each cites the reference source it reproduces):

  * ``mvdream_attn1`` / ``mvdream_i2v_attn1`` — spatial cross-view attention
    with optional I2V branch (animatediff/models/attention_processor.py:22-126,
    :302-445);
  * ``ip_adapter_attn2`` — text cross-attention + IP image-token branch
    (attention_processor.py:129-298);
  * ``spatio_temporal_attn`` — motion attention with spatial/image branches,
    2D sine / learned positional encodings, alpha blenders
    (attention_processor.py:448-743, animatediff/models/embeddings.py:8-157);
  * ``basic_transformer_block`` / ``spatial_transformer`` /
    ``motion_transformer_block`` / ``motion_module`` — the composed block
    structure the processors are installed into (diffusers
    BasicTransformerBlock / Transformer2DModel / TransformerTemporalModel
    semantics as instantiated by unet_motion_mv_model.py:158-257);
  * ``time_camera_frame_embeddings`` — time + camera embedding with per-frame
    repeat and the i2v_cond_time_zero frame-0 path
    (unet_motion_mv_model.py:705-754).

State-dict keys use the torch/diffusers naming the repo's weight converter
(animate3d_tpu/convert/torch_to_flax.py) translates, so goldens generated
from these functions validate the Flax modules AND the converter together.

All math in float32.
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F


# -- primitives (diffusers Attention helpers) --------------------------------


def linear(sd, name, x, bias=True):
    return F.linear(x, sd[f"{name}.weight"],
                    sd.get(f"{name}.bias") if bias else None)


def layer_norm(sd, name, x, eps=1e-5):
    return F.layer_norm(x, (x.shape[-1],), sd[f"{name}.weight"],
                        sd[f"{name}.bias"], eps=eps)


def head_to_batch_dim(t, heads):
    """diffusers Attention.head_to_batch_dim (out_dim=3)."""
    b, l, d = t.shape
    return (t.reshape(b, l, heads, d // heads).permute(0, 2, 1, 3)
            .reshape(b * heads, l, d // heads))


def batch_to_head_dim(t, heads):
    bh, l, d = t.shape
    return (t.reshape(bh // heads, heads, l, d).permute(0, 2, 1, 3)
            .reshape(bh // heads, l, d * heads))


def sdp(q, k, v, scale):
    """xformers memory_efficient_attention / attn.get_attention_scores math:
    softmax(q kᵀ · scale) v (fp32)."""
    s = torch.bmm(q, k.transpose(1, 2)) * scale
    return torch.bmm(torch.softmax(s, dim=-1), v)


def attention(sd, prefix, x, ctx, heads):
    """to_q/to_k/to_v (bias-free) → heads → sdp → merge → to_out.0."""
    c = x.shape[-1]
    scale = (c // heads) ** -0.5
    q = head_to_batch_dim(linear(sd, f"{prefix}.to_q", x, bias=False), heads)
    k = head_to_batch_dim(linear(sd, f"{prefix}.to_k", ctx, bias=False), heads)
    v = head_to_batch_dim(linear(sd, f"{prefix}.to_v", ctx, bias=False), heads)
    return batch_to_head_dim(sdp(q, k, v, scale), heads)


# -- positional encodings ----------------------------------------------------


def sinusoidal_positional_embedding(x, max_seq_length=32):
    """diffusers SinusoidalPositionalEmbedding.forward: x (b, seq, c) + pe."""
    c = x.shape[-1]
    position = torch.arange(max_seq_length).unsqueeze(1).float()
    div_term = torch.exp(torch.arange(0, c, 2).float()
                         * (-math.log(10000.0) / c))
    pe = torch.zeros(1, max_seq_length, c)
    pe[0, :, 0::2] = torch.sin(position * div_term)
    pe[0, :, 1::2] = torch.cos(position * div_term)
    return x + pe[:, : x.shape[1]]


def sine_positional_encoding_2d(x_bchw, num_feats, temperature=10000.0,
                                normalize=True, scale=2 * math.pi, eps=1e-6,
                                offset=0.0):
    """reference SinePositionalEncoding2D.forward (embeddings.py:52-96),
    all-valid mask. x (B, C, H, W) → x + pos."""
    b, c, h, w = x_bchw.shape
    not_mask = torch.ones(b, h, w)
    y_embed = not_mask.cumsum(1)
    x_embed = not_mask.cumsum(2)
    if normalize:
        y_embed = (y_embed + offset) / (y_embed[:, -1:, :] + eps) * scale
        x_embed = (x_embed + offset) / (x_embed[:, :, -1:] + eps) * scale
    dim_t = torch.arange(num_feats).float()
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)
    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    pos_x = torch.stack((pos_x[:, :, :, 0::2].sin(), pos_x[:, :, :, 1::2].cos()),
                        dim=4).view(b, h, w, -1)
    pos_y = torch.stack((pos_y[:, :, :, 0::2].sin(), pos_y[:, :, :, 1::2].cos()),
                        dim=4).view(b, h, w, -1)
    pos = torch.cat((pos_y, pos_x), dim=3).permute(0, 3, 1, 2)
    return x_bchw + pos


def learned_positional_encoding_2d(sd, prefix, x_bchw):
    """reference LearnedPositionalEncoding2D.forward (embeddings.py:128-157)."""
    b, c, h, w = x_bchw.shape
    col = sd[f"{prefix}.col_embed.weight"][:w]  # (w, nf)
    row = sd[f"{prefix}.row_embed.weight"][:h]  # (h, nf)
    pos = torch.cat((col.unsqueeze(0).repeat(h, 1, 1),
                     row.unsqueeze(1).repeat(1, w, 1)), dim=-1)
    return x_bchw + pos.permute(2, 0, 1).unsqueeze(0)


# -- the four processors -----------------------------------------------------


def mvdream_attn1(sd, prefix, x, heads, num_views, num_frames):
    """Processor (a) MVDreamXFormersAttnProcessor, self-attention path
    (attention_processor.py:39-126): (b n f) l c → (b f) (n l) c dense
    cross-view attention → back. Residual handled by the caller (diffusers
    Attention has residual_connection=False inside BasicTransformerBlock)."""
    bnf, l, c = x.shape
    n, f = num_views, num_frames
    b = bnf // (n * f)
    xr = (x.reshape(b, n, f, l, c).permute(0, 2, 1, 3, 4)
          .reshape(b * f, n * l, c))
    h = attention(sd, prefix, xr, xr, heads)
    h = linear(sd, f"{prefix}.to_out.0", h)
    return (h.reshape(b, f, n, l, c).permute(0, 2, 1, 3, 4)
            .reshape(bnf, l, c))


def mvdream_i2v_attn1(sd, prefix, x, heads, num_views, num_frames):
    """Processor (c) MVDreamI2VXFormersAttnProcessor
    (attention_processor.py:325-445): (a) plus the I2V branch — queries via
    to_q_i2v, K/V from the FIRST frame broadcast to all frames, projected by
    to_out_i2v, summed before to_out."""
    bnf, l, c = x.shape
    n, f = num_views, num_frames
    b = bnf // (n * f)
    scale = (c // heads) ** -0.5
    xr = (x.reshape(b, n, f, l, c).permute(0, 2, 1, 3, 4)
          .reshape(b * f, n * l, c))

    q = linear(sd, f"{prefix}.to_q", xr, bias=False)
    k = linear(sd, f"{prefix}.to_k", xr, bias=False)
    v = linear(sd, f"{prefix}.to_v", xr, bias=False)

    # first-frame K/V repeated over frames (:389-397)
    first_key = k.reshape(b, f, n * l, c)[:, 0:1].repeat_interleave(f, dim=1)
    first_value = v.reshape(b, f, n * l, c)[:, 0:1].repeat_interleave(f, dim=1)
    i2v_key = head_to_batch_dim(first_key.reshape(b * f, n * l, c), heads)
    i2v_value = head_to_batch_dim(first_value.reshape(b * f, n * l, c), heads)

    h = batch_to_head_dim(
        sdp(head_to_batch_dim(q, heads), head_to_batch_dim(k, heads),
            head_to_batch_dim(v, heads), scale), heads)

    i2v_query = head_to_batch_dim(
        linear(sd, f"{prefix}.processor.to_q_i2v", xr, bias=False), heads)
    i2v_h = batch_to_head_dim(sdp(i2v_query, i2v_key, i2v_value, scale), heads)
    i2v_h = linear(sd, f"{prefix}.processor.to_out_i2v", i2v_h)

    h = h + i2v_h
    h = linear(sd, f"{prefix}.to_out.0", h)
    return (h.reshape(b, f, n, l, c).permute(0, 2, 1, 3, 4)
            .reshape(bnf, l, c))


def ip_adapter_attn2(sd, prefix, x, ctx, ip_ctx, heads, ip_scale=1.0):
    """Processor (b) IPAdapterXFormersAttnProcessor
    (attention_processor.py:169-298): text cross-attention + image-token
    branch (to_k_ip.0/to_v_ip.0) with the SAME queries, scaled sum."""
    c = x.shape[-1]
    scale = (c // heads) ** -0.5
    q = head_to_batch_dim(linear(sd, f"{prefix}.to_q", x, bias=False), heads)
    k = head_to_batch_dim(linear(sd, f"{prefix}.to_k", ctx, bias=False), heads)
    v = head_to_batch_dim(linear(sd, f"{prefix}.to_v", ctx, bias=False), heads)
    h = batch_to_head_dim(sdp(q, k, v, scale), heads)

    ip_k = head_to_batch_dim(
        linear(sd, f"{prefix}.processor.to_k_ip.0", ip_ctx, bias=False), heads)
    ip_v = head_to_batch_dim(
        linear(sd, f"{prefix}.processor.to_v_ip.0", ip_ctx, bias=False), heads)
    h_ip = batch_to_head_dim(sdp(q, ip_k, ip_v, scale), heads)
    h = h + ip_scale * h_ip
    return linear(sd, f"{prefix}.to_out.0", h)


def spatio_temporal_attn(sd, prefix, x, heads, num_views, num_frames,
                         feature_size, spatial_attn=True, image_attn=False,
                         use_alpha_blender=True,
                         spatial_encoding_type="sinusoid",
                         camera_encoding_type=None):
    """Processor (d) SpatioTemporalI2VXFormersAttnProcessor
    (attention_processor.py:541-723).  x: (b·n·h·w, f, c) post-norm tokens
    WITHOUT the block positional embedding (the caller nulls it; the time PE
    is re-applied here when the spatial encodings are on, :583-584)."""
    bl, f, c = x.shape
    n, fs = num_views, feature_size
    hw = fs * fs
    b = bl // (n * hw)
    scale = (c // heads) ** -0.5
    p = f"{prefix}.processor"

    use_extra = spatial_attn and (spatial_encoding_type is not None
                                  or camera_encoding_type is not None)

    sp_x = None
    if spatial_attn:
        seq = n * hw
        sp_x = (x.reshape(b, seq, f, c).permute(0, 2, 1, 3)
                .reshape(b * f, seq, c))  # "(b l) f c -> (b f) l c"
        if spatial_encoding_type is not None:
            t = (sp_x.reshape(b * f, n, fs, fs, c)
                 .permute(0, 1, 4, 2, 3).reshape(b * f * n, c, fs, fs))
            if spatial_encoding_type == "sinusoid":
                t = sine_positional_encoding_2d(t, c // 2, normalize=True)
            else:
                t = learned_positional_encoding_2d(
                    sd, f"{p}.spatial_pos_embed", t)
            sp_x = (t.reshape(b * f, n, c, fs, fs).permute(0, 1, 3, 4, 2)
                    .reshape(b * f, seq, c))
        if camera_encoding_type == "sinusoid":
            # (b h w) n c layout + PE over the view index (:572-575)
            t = (sp_x.reshape(b * f, n, hw, c).permute(0, 2, 1, 3)
                 .reshape(b * f * hw, n, c))
            t = sinusoidal_positional_embedding(t, max_seq_length=n)
            sp_x = (t.reshape(b * f, hw, n, c).permute(0, 2, 1, 3)
                    .reshape(b * f, seq, c))
        elif camera_encoding_type == "learnable":
            emb = sd[f"{p}.camera_embed.embedding_table.weight"]  # (n, c)
            sp_x = (sp_x.reshape(b * f, n, hw, c)
                    + emb[None, :, None, :]).reshape(b * f, seq, c)

    img_x = None
    if image_attn:
        img_x = (x.reshape(b * n, hw, f, c).permute(0, 2, 1, 3)
                 .reshape(b * n * f, hw, c))

    if use_extra:
        x = sinusoidal_positional_embedding(x, max_seq_length=32)

    # temporal branch: vanilla scores (get_attention_scores, :634-636)
    h = attention(sd, prefix, x, x, heads)
    h = linear(sd, f"{prefix}.to_out.0", h)

    h_sp = None
    if spatial_attn:
        q = head_to_batch_dim(linear(sd, f"{p}.to_q_sp", sp_x, bias=False), heads)
        k = head_to_batch_dim(linear(sd, f"{p}.to_k_sp", sp_x, bias=False), heads)
        v = head_to_batch_dim(linear(sd, f"{p}.to_v_sp", sp_x, bias=False), heads)
        h_sp = batch_to_head_dim(sdp(q, k, v, scale), heads)
        h_sp = linear(sd, f"{p}.to_out_sp", h_sp)
        h_sp = (h_sp.reshape(b, f, n * hw, c).permute(0, 2, 1, 3)
                .reshape(bl, f, c))

    h_img = None
    if image_attn:
        q = head_to_batch_dim(linear(sd, f"{p}.to_q_i2v", img_x, bias=False), heads)
        x0 = img_x.reshape(b * n, f, hw, c)[:, 0]
        k0 = linear(sd, f"{p}.to_k_i2v", x0, bias=False)
        v0 = linear(sd, f"{p}.to_v_i2v", x0, bias=False)
        k0 = k0.unsqueeze(1).repeat_interleave(f, dim=1).reshape(b * n * f, hw, c)
        v0 = v0.unsqueeze(1).repeat_interleave(f, dim=1).reshape(b * n * f, hw, c)
        h_img = batch_to_head_dim(
            sdp(q, head_to_batch_dim(k0, heads), head_to_batch_dim(v0, heads),
                scale), heads)
        h_img = linear(sd, f"{p}.to_out_i2v", h_img)
        h_img = (h_img.reshape(b * n, f, hw, c).permute(0, 2, 1, 3)
                 .reshape(bl, f, c))

    if not use_alpha_blender:
        if h_sp is not None:
            h = h + h_sp
        if h_img is not None:
            h = h + h_img
        return h
    if h_sp is not None and h_img is None:
        alpha = torch.sigmoid(sd[f"{p}.alpha_blender.mix_factor"])[0]
        return alpha * h_sp + (1 - alpha) * h
    if h_img is not None and h_sp is None:
        alpha = torch.sigmoid(sd[f"{p}.alpha_blender.mix_factor"])[0]
        return alpha * h_img + (1 - alpha) * h
    if h_sp is not None and h_img is not None:
        a = torch.softmax(sd[f"{p}.alpha_blender.mix_factor"], dim=0)
        return a[0] * h_sp + a[1] * h + a[2] * h_img
    return h


# -- composed blocks ---------------------------------------------------------


def feed_forward_geglu(sd, prefix, x):
    """diffusers FeedForward(activation_fn='geglu')."""
    proj = linear(sd, f"{prefix}.net.0.proj", x)
    hidden, gate = proj.chunk(2, dim=-1)
    return linear(sd, f"{prefix}.net.2", hidden * F.gelu(gate))


def basic_transformer_block(sd, prefix, x, ctx, ip_ctx, heads, num_views,
                            num_frames):
    """diffusers BasicTransformerBlock with the MVDream-I2V attn1 +
    IP-Adapter attn2 processors installed (norm→attn→residual ×2, GEGLU ff)."""
    h = layer_norm(sd, f"{prefix}.norm1", x)
    x = x + mvdream_i2v_attn1(sd, f"{prefix}.attn1", h, heads, num_views,
                              num_frames)
    h = layer_norm(sd, f"{prefix}.norm2", x)
    x = x + ip_adapter_attn2(sd, f"{prefix}.attn2", h, ctx, ip_ctx, heads)
    h = layer_norm(sd, f"{prefix}.norm3", x)
    return x + feed_forward_geglu(sd, f"{prefix}.ff", h)


def spatial_transformer(sd, x_bchw, ctx, ip_ctx, heads, num_views, num_frames):
    """diffusers Transformer2DModel, use_linear_projection=False: GroupNorm
    (eps 1e-6) → 1×1 conv proj_in → tokens → block → proj_out → +residual."""
    b, c, hh, ww = x_bchw.shape
    residual = x_bchw
    h = F.group_norm(x_bchw, 32 if c % 32 == 0 else c,
                     sd["norm.weight"], sd["norm.bias"], eps=1e-6)
    h = F.conv2d(h, sd["proj_in.weight"], sd["proj_in.bias"])
    h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
    h = basic_transformer_block(sd, "transformer_blocks.0", h, ctx, ip_ctx,
                                heads, num_views, num_frames)
    h = h.reshape(b, hh, ww, c).permute(0, 3, 1, 2)
    h = F.conv2d(h, sd["proj_out.weight"], sd["proj_out.bias"])
    return h + residual


def motion_transformer_block(sd, prefix, x, heads, num_views, num_frames,
                             feature_size, **attn_flags):
    """AnimateDiff temporal BasicTransformerBlock: two self-attentions with
    the spatiotemporal processor, GEGLU ff.  The block's own pos_embed is
    nulled when the processor re-applies it (inference.py:177-192) — so the
    PE appears inside spatio_temporal_attn only."""
    st = lambda p, h: spatio_temporal_attn(
        sd, p, h, heads, num_views, num_frames, feature_size, **attn_flags)
    h = layer_norm(sd, f"{prefix}.norm1", x)
    x = x + st(f"{prefix}.attn1", h)
    h = layer_norm(sd, f"{prefix}.norm2", x)
    x = x + st(f"{prefix}.attn2", h)
    h = layer_norm(sd, f"{prefix}.norm3", x)
    return x + feed_forward_geglu(sd, f"{prefix}.ff", h)


def motion_module(sd, x_bfchw, heads, num_views, num_frames, **attn_flags):
    """diffusers TransformerTemporalModel as instantiated for motion modules:
    GroupNorm over (c, f, h, w) → tokens (b·h·w, f, c) → linear proj_in →
    block → proj_out → +residual.  x: (b·n·f, c, h, w)."""
    bnf, c, hh, ww = x_bfchw.shape
    f = num_frames
    bn = bnf // f
    residual = x_bfchw
    h = x_bfchw.reshape(bn, f, c, hh, ww).permute(0, 2, 1, 3, 4)  # b c f h w
    h = F.group_norm(h, 32 if c % 32 == 0 else c, sd["norm.weight"],
                     sd["norm.bias"], eps=1e-6)
    h = h.permute(0, 3, 4, 2, 1).reshape(bn * hh * ww, f, c)
    h = linear(sd, "proj_in", h)
    h = motion_transformer_block(sd, "transformer_blocks.0", h, heads,
                                 num_views, num_frames, hh, **attn_flags)
    h = linear(sd, "proj_out", h)
    h = (h.reshape(bn, hh, ww, f, c).permute(0, 3, 4, 1, 2)
         .reshape(bnf, c, hh, ww))
    return h + residual


# -- embedding plumbing ------------------------------------------------------


def get_timestep_embedding(timesteps, dim, flip_sin_to_cos=True,
                           downscale_freq_shift=0.0, max_period=10000.0):
    """diffusers Timesteps/get_timestep_embedding (used as time_proj)."""
    half = dim // 2
    exponent = -math.log(max_period) * torch.arange(half).float()
    exponent = exponent / (half - downscale_freq_shift)
    emb = torch.exp(exponent)[None, :] * timesteps.float()[:, None]
    sin, cos = torch.sin(emb), torch.cos(emb)
    return torch.cat([cos, sin] if flip_sin_to_cos else [sin, cos], dim=-1)


def timestep_embedding_mlp(sd, prefix, x):
    """diffusers TimestepEmbedding: linear_1 → silu → linear_2."""
    x = linear(sd, f"{prefix}.linear_1", x)
    return linear(sd, f"{prefix}.linear_2", F.silu(x))


def time_camera_frame_embeddings(sd, timesteps, camera, num_frames,
                                 i2v_cond_time_zero, base_dim):
    """unet_motion_mv_model.py:705-754: time_proj → time_embedding, camera
    TimestepEmbedding added, repeat_interleave over frames, and the
    i2v_cond_time_zero frame-0 substitution with the t=0 embedding.
    Returns (b·n·f, D) frame-minor."""
    bn = camera.shape[0]
    ts = timesteps.expand(bn) if timesteps.ndim else timesteps[None].expand(bn)
    t_emb = get_timestep_embedding(ts, base_dim)
    emb = timestep_embedding_mlp(sd, "time_embedding", t_emb)
    if i2v_cond_time_zero:
        cond_t_emb = get_timestep_embedding(torch.zeros(bn), base_dim)
        cond_emb = timestep_embedding_mlp(sd, "time_embedding", cond_t_emb)
    camera_emb = timestep_embedding_mlp(sd, "camera_embedding", camera)
    emb = emb + camera_emb
    if i2v_cond_time_zero:
        cond_emb = cond_emb + camera_emb
    emb = emb.repeat_interleave(num_frames, dim=0)
    if i2v_cond_time_zero:
        emb = emb.reshape(bn, num_frames, -1)
        emb = torch.cat([cond_emb.unsqueeze(1), emb[:, 1:]], dim=1)
        emb = emb.reshape(bn * num_frames, -1)
    return emb
