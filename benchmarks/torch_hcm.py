"""PyTorch-CPU HCM forward baseline for bench.py.

A timing-faithful torch implementation of the hierarchical agent's per-frame
compute (reference seq2seq_highlevel_cma.py + seq2seq_lowlevel.py): frozen
BERT-base over the instruction, TWO spatial ResNet50 passes (rgb + depth) for
the high level, TWO vector ResNet50 passes for the low level, VisualLingAttn
cross-modal block, and both LSTMs.  Weights are random — this measures
throughput, not quality — but layer shapes match the paper configuration, so
frames/sec is the honest PyTorch-CPU number the TPU path is compared against
(BASELINE.json north star).

torchvision isn't in the image; the ResNet50 here is the standard torchvision
topology built from torch.nn primitives.
"""

from __future__ import annotations

import time

import numpy as np
import torch
import torch.nn as nn


def conv1x1(i, o, s=1):
    return nn.Conv2d(i, o, 1, s, bias=False)


def conv3x3(i, o, s=1):
    return nn.Conv2d(i, o, 3, s, 1, bias=False)


class Bottleneck(nn.Module):
    def __init__(self, inplanes, planes, stride=1, norm="bn", ngroups=16):
        super().__init__()

        def make_norm(ch):
            return nn.BatchNorm2d(ch) if norm == "bn" else nn.GroupNorm(ngroups, ch)

        self.conv1, self.bn1 = conv1x1(inplanes, planes), make_norm(planes)
        self.conv2, self.bn2 = conv3x3(planes, planes, stride), make_norm(planes)
        self.conv3, self.bn3 = conv1x1(planes, planes * 4), make_norm(planes * 4)
        self.down = (
            nn.Sequential(conv1x1(inplanes, planes * 4, stride), make_norm(planes * 4))
            if (stride != 1 or inplanes != planes * 4)
            else None
        )

    def forward(self, x):
        idt = x if self.down is None else self.down(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = torch.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return torch.relu(out + idt)


class ResNet50(nn.Module):
    def __init__(self, in_ch=3, base=64, norm="bn"):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, base, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(base) if norm == "bn" else nn.GroupNorm(16, base)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        layers = []
        inplanes, planes = base, base
        for li, n in enumerate([3, 4, 6, 3]):
            stride = 1 if li == 0 else 2
            for bi in range(n):
                layers.append(
                    Bottleneck(inplanes, planes, stride if bi == 0 else 1, norm)
                )
                inplanes = planes * 4
            planes *= 2
        self.layers = nn.Sequential(*layers)
        self.out_channels = inplanes

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        return self.layers(x)


class TorchHCM(nn.Module):
    """Per-window HCM forward: instruction (1, L), rgb (T, 224, 224, 3),
    depth (T, 256, 256, 1)."""

    def __init__(self, d_model=256, hidden=512, bert_layers=12):
        super().__init__()
        from transformers import BertConfig, BertModel

        self.bert = BertModel(BertConfig(num_hidden_layers=bert_layers)).eval()
        # high level: spatial encoders
        self.rgb_hi = ResNet50(3, 64, "bn").eval()
        self.depth_hi = ResNet50(1, 32, "gn").eval()
        self.depth_compress = nn.Sequential(
            conv3x3(1024, 32), nn.GroupNorm(1, 32), nn.ReLU(True)
        )
        self.rgb_kv = nn.Conv1d(2048 + 64, d_model, 1)
        self.depth_kv = nn.Conv1d(32 + 64, d_model, 1)
        self.vis_fc = nn.Linear(d_model, d_model)
        self.ins_fc = nn.Linear(768, d_model)
        self.mha = nn.MultiheadAttention(d_model, 4, batch_first=True)
        self.ffn = nn.Sequential(
            nn.Linear(d_model, 1024), nn.ReLU(True), nn.Linear(1024, d_model)
        )
        self.rgb_linear = nn.Linear(2048 + 64, 256)
        self.depth_linear = nn.Linear((32 + 64) * 64, 128)
        self.high_rnn = nn.LSTM(2 * d_model + 256 + 128, hidden)
        self.high_head = nn.Linear(hidden, 4)
        # low level: vector encoders
        self.rgb_lo = ResNet50(3, 64, "bn").eval()
        self.depth_lo = ResNet50(1, 32, "gn").eval()
        self.depth_lo_compress = nn.Sequential(
            conv3x3(1024, 32), nn.GroupNorm(1, 32), nn.ReLU(True)
        )
        self.rgb_lo_fc = nn.Linear(2048, 256)
        self.depth_lo_fc = nn.Linear(32 * 64, 128)
        self.sub_emb = nn.Embedding(5, 32)
        self.low_rnn = nn.LSTM(256 + 128 + 32, hidden)
        self.low_head = nn.Linear(hidden, 2)
        self.stop_head = nn.Linear(hidden, 1)

    @torch.no_grad()
    def forward(self, instruction, rgb, depth):
        T = rgb.shape[0]
        emb = self.bert(instruction).last_hidden_state  # (1, L, 768)
        emb = emb.expand(T, -1, -1)

        rgb_nchw = rgb.permute(0, 3, 1, 2) / 255.0
        depth_nchw = depth.permute(0, 3, 1, 2)

        # high level spatial
        rf = self.rgb_hi(rgb_nchw)  # (T, 2048, 7, 7)
        rf = torch.nn.functional.adaptive_avg_pool2d(rf, (4, 4))
        rf = torch.cat([rf, torch.zeros(T, 64, 4, 4)], dim=1).flatten(2)
        df = self.depth_compress(self.depth_hi(depth_nchw))  # (T, 32, 8, 8)
        df = torch.cat([df, torch.zeros(T, 64, 8, 8)], dim=1).flatten(2)

        rgb_sp = self.rgb_kv(rf).permute(0, 2, 1)  # (T, 16, 256)
        depth_sp = self.depth_kv(df).permute(0, 2, 1)  # (T, 64, 256)
        ins = torch.relu(self.ins_fc(emb))
        att_r, _ = self.mha(ins, torch.relu(self.vis_fc(rgb_sp)),
                            torch.relu(self.vis_fc(rgb_sp)))
        att_d, _ = self.mha(ins, torch.relu(self.vis_fc(depth_sp)),
                            torch.relu(self.vis_fc(depth_sp)))
        att_r = self.ffn(att_r).mean(1)
        att_d = self.ffn(att_d).mean(1)
        rgb_in = torch.relu(self.rgb_linear(rf.mean(-1)))
        depth_in = torch.relu(self.depth_linear(df.flatten(1)))
        x = torch.cat([rgb_in, depth_in, att_r, att_d], dim=1).unsqueeze(1)
        hi_out, _ = self.high_rnn(x)
        sub = self.high_head(hi_out[:, 0]).argmax(-1)

        # low level vector
        rlo = self.rgb_lo(rgb_nchw).mean((2, 3))
        dlo = self.depth_lo_compress(self.depth_lo(depth_nchw)).flatten(1)
        xl = torch.cat(
            [torch.relu(self.rgb_lo_fc(rlo)), torch.relu(self.depth_lo_fc(dlo)),
             self.sub_emb(sub)], dim=1,
        ).unsqueeze(1)
        lo_out, _ = self.low_rnn(xl)
        return self.low_head(lo_out[:, 0]), self.stop_head(lo_out[:, 0])


def _train_window(model, instruction, rgb, depth, subgoals, vel_t, stop_t,
                  opt_high, opt_low):
    """One IL train window mirroring the reference hot loop
    (hierarchical_trainer.py:492-560): frozen trunks under no_grad, trainable
    heads/LSTMs/attention grad-enabled, CE+MSE+BCE losses, backward, both
    optimizer steps."""
    import torch.nn.functional as F

    T = rgb.shape[0]
    with torch.no_grad():
        emb = model.bert(instruction).last_hidden_state.expand(T, -1, -1)
        rgb_nchw = rgb.permute(0, 3, 1, 2) / 255.0
        depth_nchw = depth.permute(0, 3, 1, 2)
        rf_raw = model.rgb_hi(rgb_nchw)
        df_raw = model.depth_hi(depth_nchw)
        rlo = model.rgb_lo(rgb_nchw).mean((2, 3))
        dlo_raw = model.depth_lo(depth_nchw)

    rf = F.adaptive_avg_pool2d(rf_raw, (4, 4))
    rf = torch.cat([rf, torch.zeros(T, 64, 4, 4)], dim=1).flatten(2)
    df = model.depth_compress(df_raw)
    df = torch.cat([df, torch.zeros(T, 64, 8, 8)], dim=1).flatten(2)
    rgb_sp = model.rgb_kv(rf).permute(0, 2, 1)
    depth_sp = model.depth_kv(df).permute(0, 2, 1)
    ins = torch.relu(model.ins_fc(emb))
    att_r, _ = model.mha(ins, torch.relu(model.vis_fc(rgb_sp)),
                         torch.relu(model.vis_fc(rgb_sp)))
    att_d, _ = model.mha(ins, torch.relu(model.vis_fc(depth_sp)),
                         torch.relu(model.vis_fc(depth_sp)))
    att_r = model.ffn(att_r).mean(1)
    att_d = model.ffn(att_d).mean(1)
    rgb_in = torch.relu(model.rgb_linear(rf.mean(-1)))
    depth_in = torch.relu(model.depth_linear(df.flatten(1)))
    x = torch.cat([rgb_in, depth_in, att_r, att_d], dim=1).unsqueeze(1)
    hi_out, _ = model.high_rnn(x)
    hi_logits = model.high_head(hi_out[:, 0])

    dlo = model.depth_lo_compress(dlo_raw).flatten(1)
    xl = torch.cat(
        [torch.relu(model.rgb_lo_fc(rlo)), torch.relu(model.depth_lo_fc(dlo)),
         model.sub_emb(subgoals)], dim=1,
    ).unsqueeze(1)
    lo_out, _ = model.low_rnn(xl)
    vel = model.low_head(lo_out[:, 0])
    stop = model.stop_head(lo_out[:, 0])

    loss = (
        F.cross_entropy(hi_logits, subgoals)
        + F.mse_loss(vel, vel_t)
        + F.binary_cross_entropy_with_logits(stop, stop_t)
    )
    opt_high.zero_grad()
    opt_low.zero_grad()
    loss.backward()
    opt_high.step()
    opt_low.step()
    return float(loss.detach())


def measure_torch_cpu_train_fps(frames: int = 2, repeats: int = 3) -> float:
    """Frames/sec of the torch-CPU HCM IL train step (forward + backward +
    AdamW high / Adam low optimizer steps, frozen trunks no-grad — reference
    hierarchical_trainer.py:492-560).  Uses all CPU cores
    (torch.get_num_threads() default; recorded in baseline_cache.json)."""
    torch.manual_seed(0)
    model = TorchHCM()
    for mod in (model.bert, model.rgb_hi, model.depth_hi, model.rgb_lo,
                model.depth_lo):
        for p in mod.parameters():
            p.requires_grad_(False)
    high_names = ("depth_compress", "rgb_kv", "depth_kv", "vis_fc", "ins_fc",
                  "mha", "ffn", "rgb_linear", "depth_linear", "high_rnn",
                  "high_head")
    high_params, low_params = [], []
    for name, p in model.named_parameters():
        if not p.requires_grad:
            continue
        (high_params if name.split(".")[0] in high_names else low_params).append(p)
    opt_high = torch.optim.AdamW(high_params, lr=1e-4)
    opt_low = torch.optim.Adam(low_params, lr=1e-4)

    instruction = torch.randint(1, 1000, (1, 200))
    rgb = torch.rand(frames, 224, 224, 3) * 255
    depth = torch.rand(frames, 256, 256, 1)
    subgoals = torch.randint(0, 4, (frames,))
    vel_t = torch.rand(frames, 2)
    stop_t = (torch.rand(frames, 1) > 0.7).float()

    _train_window(model, instruction, rgb[:1], depth[:1], subgoals[:1],
                  vel_t[:1], stop_t[:1], opt_high, opt_low)  # warmup
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _train_window(model, instruction, rgb, depth, subgoals, vel_t, stop_t,
                      opt_high, opt_low)
        times.append(time.perf_counter() - t0)
    return frames / min(times)


def measure_torch_cpu_fps(frames: int = 4, repeats: int = 3) -> float:
    """Frames/sec of the torch-CPU HCM forward (all cores, eval mode)."""
    torch.manual_seed(0)
    model = TorchHCM().eval()
    instruction = torch.randint(1, 1000, (1, 200))
    rgb = torch.rand(frames, 224, 224, 3) * 255
    depth = torch.rand(frames, 256, 256, 1)
    with torch.no_grad():
        model(instruction, rgb[:1], depth[:1])  # warmup
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            model(instruction, rgb, depth)
            times.append(time.perf_counter() - t0)
    return frames / min(times)


if __name__ == "__main__":
    print(measure_torch_cpu_fps())
