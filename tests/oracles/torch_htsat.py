"""Compact torch oracle for the HTSAT encoder math.

The real reference (mellow/model/htsat.py) cannot be imported in this env
(torchlibrosa is absent), so this module re-states its architecture in
minimal torch code, with state_dict key names chosen to MATCH the reference
checkpoint layout (patch_embed.proj.*, layers.N.blocks.M.attn.qkv.*, ...) so
that tools/convert_ckpt.py::convert_htsat consumes an oracle state_dict
exactly as it would consume v0.ckpt. Every forward step cites the reference
line it mirrors.
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def window_partition(x, ws):
    # htsat.py:224-235
    B, H, W, C = x.shape
    x = x.view(B, H // ws, ws, W // ws, ws, C)
    return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(-1, ws, ws, C)


def window_reverse(windows, ws, H, W):
    # htsat.py:238-251
    B = int(windows.shape[0] / (H * W / ws / ws))
    x = windows.view(B, H // ws, W // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(B, H, W, -1)


class WindowAttention(nn.Module):
    # htsat.py:254-332
    def __init__(self, dim, ws, heads):
        super().__init__()
        self.ws, self.heads = ws, heads
        self.scale = (dim // heads) ** -0.5
        self.relative_position_bias_table = nn.Parameter(
            torch.randn((2 * ws - 1) ** 2, heads) * 0.02
        )
        coords = torch.stack(
            torch.meshgrid(torch.arange(ws), torch.arange(ws), indexing="ij")
        ).flatten(1)
        rel = coords[:, :, None] - coords[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += ws - 1
        rel[:, :, 1] += ws - 1
        rel[:, :, 0] *= 2 * ws - 1
        self.register_buffer("relative_position_index", rel.sum(-1))
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, mask=None):
        B_, N, C = x.shape
        qkv = (
            self.qkv(x)
            .reshape(B_, N, 3, self.heads, C // self.heads)
            .permute(2, 0, 3, 1, 4)
        )
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)
        ].view(N, N, -1)
        attn = attn + bias.permute(2, 0, 1).unsqueeze(0)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(B_ // nW, nW, self.heads, N, N) + mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, self.heads, N, N)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B_, N, C)
        return self.proj(x)


class Mlp(nn.Module):
    # htsat.py:118-136
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class SwinBlock(nn.Module):
    # htsat.py:339-455 (eval: drop_path = identity)
    def __init__(self, dim, resolution, heads, ws, shift):
        super().__init__()
        self.resolution = resolution
        if resolution <= ws:
            ws, shift = resolution, 0
        self.ws, self.shift = ws, shift
        self.norm1 = nn.LayerNorm(dim)
        self.attn = WindowAttention(dim, ws, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = Mlp(dim, dim * 4)
        if shift > 0:
            H = W = resolution
            img = torch.zeros(1, H, W, 1)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                    img[:, hs, wsl, :] = cnt
                    cnt += 1
            mw = window_partition(img, ws).view(-1, ws * ws)
            mask = mw.unsqueeze(1) - mw.unsqueeze(2)
            mask = mask.masked_fill(mask != 0, -100.0).masked_fill(mask == 0, 0.0)
            self.register_buffer("attn_mask", mask)
        else:
            self.attn_mask = None

    def forward(self, x):
        H = W = self.resolution
        B, L, C = x.shape
        shortcut = x
        x = self.norm1(x).view(B, H, W, C)
        if self.shift > 0:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
        win = window_partition(x, self.ws).view(-1, self.ws * self.ws, C)
        win = self.attn(win, self.attn_mask)
        x = window_reverse(win.view(-1, self.ws, self.ws, C), self.ws, H, W)
        if self.shift > 0:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        x = shortcut + x.view(B, L, C)
        return x + self.mlp(self.norm2(x))


class PatchMerging(nn.Module):
    # htsat.py:463-499
    def __init__(self, resolution, dim):
        super().__init__()
        self.resolution = resolution
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(4 * dim)

    def forward(self, x):
        H = W = self.resolution
        B, L, C = x.shape
        x = x.view(B, H, W, C)
        x = torch.cat(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]], -1
        ).view(B, -1, 4 * C)
        return self.reduction(self.norm(x))


class Stage(nn.Module):
    def __init__(self, dim, resolution, depth, heads, ws, downsample):
        super().__init__()
        self.blocks = nn.ModuleList(
            [
                SwinBlock(dim, resolution, heads, ws, 0 if i % 2 == 0 else ws // 2)
                for i in range(depth)
            ]
        )
        self.downsample = PatchMerging(resolution, dim) if downsample else None

    def forward(self, x):
        for blk in self.blocks:
            x = blk(x)
        if self.downsample is not None:
            x = self.downsample(x)
        return x


class PatchEmbedOracle(nn.Module):
    def __init__(self, embed_dim=96, patch=4):
        super().__init__()
        self.proj = nn.Conv2d(1, embed_dim, patch, patch)
        self.norm = nn.LayerNorm(embed_dim)

    def forward(self, x):
        # htsat.py:108-116
        return self.norm(self.proj(x).flatten(2).transpose(1, 2))


class OracleHTSAT(nn.Module):
    """Swin trunk + TSCAM head over the (B, 1, 256, 256) spec image.
    Front-end (stft/mel/bn0/bicubic/fold) is composed externally in tests."""

    def __init__(
        self, spec_size=256, patch=4, embed_dim=96, depths=(2, 2, 6, 2),
        heads=(4, 8, 16, 32), ws=8, num_classes=527, mel_bins=64,
    ):
        super().__init__()
        self.freq_ratio = spec_size // mel_bins
        self.depths = depths
        self.bn0 = nn.BatchNorm2d(mel_bins)
        self.patch_embed = PatchEmbedOracle(embed_dim, patch)
        res = spec_size // patch
        self.layers = nn.ModuleList()
        for i, d in enumerate(depths):
            self.layers.append(
                Stage(
                    embed_dim * 2 ** i, res // 2 ** i, d, heads[i], ws,
                    downsample=i < len(depths) - 1,
                )
            )
        nf = embed_dim * 2 ** (len(depths) - 1)
        self.norm = nn.LayerNorm(nf)
        SF = spec_size // (2 ** (len(depths) - 1)) // patch // self.freq_ratio  # 2
        self.tscam_conv = nn.Conv2d(nf, num_classes, (SF, 3), padding=(0, 1))
        self.head = nn.Linear(num_classes, num_classes)  # dead (htsat.py:710)

    def forward_features(self, img):
        # htsat.py:733-796 (tscam branch)
        x = self.patch_embed(img)
        for layer in self.layers:
            x = layer(x)
        x = self.norm(x)
        B, N, C = x.shape
        frames_num = img.shape[2]
        SF = frames_num // (2 ** (len(self.depths) - 1)) // 4
        ST = SF
        x = x.permute(0, 2, 1).contiguous().reshape(B, C, SF, ST)
        cfb = SF // self.freq_ratio
        x = x.reshape(B, C, SF // cfb, cfb, ST)
        x = x.permute(0, 1, 3, 2, 4).contiguous().reshape(B, C, cfb, -1)
        latent = torch.flatten(
            F.adaptive_avg_pool1d(torch.flatten(x, 2), 1), 1
        )
        x = self.tscam_conv(x)
        x = torch.flatten(x, 2)
        fpx = torch.sigmoid(x).permute(0, 2, 1).contiguous()
        fpx = (
            fpx[:, :, None, :]
            .repeat(1, 1, 32, 1)
            .reshape(B, fpx.shape[1] * 32, -1)
        )
        clip = torch.sigmoid(torch.flatten(F.adaptive_avg_pool1d(x, 1), 1))
        return {
            "framewise_output": fpx,
            "clipwise_output": clip,
            "latent_output": latent,
        }


class OracleWrapper(nn.Module):
    """HTSATWrapper + Projection (htsat.py:943-955, mellow.py:33-68)."""

    def __init__(self, d_proj=576, **kw):
        super().__init__()
        self.htsat = OracleHTSAT(**kw)
        nf = self.htsat.tscam_conv.in_channels  # embed_dim * 8
        self.c2l = nn.Linear(self.htsat.tscam_conv.out_channels, nf)
        self.linear1 = nn.Linear(nf, d_proj, bias=False)
        self.linear2 = nn.Linear(d_proj, d_proj, bias=False)
        self.layer_norm = nn.LayerNorm(d_proj)

    def forward(self, img):
        out = self.htsat.forward_features(img)
        oframe = self.c2l(out["framewise_output"])
        emb = torch.cat([out["latent_output"].unsqueeze(1), oframe], dim=1)
        e1 = self.linear1(emb)
        e2 = self.linear2(F.gelu(e1))
        out["embedding"] = emb
        out["projected"] = self.layer_norm(e1 + e2)
        return out


def oracle_frontend_image(wave: np.ndarray, bn0: nn.BatchNorm2d, mel_fb: np.ndarray):
    """Torch front-end oracle: torch.stft power -> mel matmul -> 10log10 ->
    bn0 -> bicubic 1001->1024 -> fold (htsat.py:864-870, 830-845, 937-938)."""
    win = torch.hann_window(1024, periodic=True)
    spec = torch.stft(
        torch.from_numpy(wave), n_fft=1024, hop_length=320, win_length=1024,
        window=win, center=True, pad_mode="reflect", onesided=True,
        return_complex=True,
    )
    power = (spec.abs() ** 2).transpose(1, 2)  # (B, T, bins)
    mel = power @ torch.from_numpy(mel_fb)
    logmel = 10.0 * torch.log10(torch.clamp(mel, min=1e-10))
    x = logmel[:, None]  # (B,1,T,F)
    x = bn0(x.transpose(1, 3)).transpose(1, 3)
    x = F.interpolate(x, (1024, x.shape[3]), mode="bicubic", align_corners=True)
    x = x.permute(0, 1, 3, 2).contiguous()
    x = x.reshape(x.shape[0], 1, 64, 4, 256).permute(0, 1, 3, 2, 4).contiguous()
    return x.reshape(x.shape[0], 1, 256, 256)
