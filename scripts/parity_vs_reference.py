"""Empirical parity run: the REFERENCE's own torch model and training
semantics vs coskad_tpu on an identical synthetic dataset.

Trains the reference's Encoder+linear-projector (imported from
/root/reference — their code, not a copy) with their center-init, loss
(mse-to-center + alpha*calc_reg_loss), 5-transform expansion and scoring
loop; then compare with:

    python -m coskad_tpu.cli.train --config /tmp/coskad_parity/smoke.yaml --epochs 20
    python -m coskad_tpu.cli.eval  --config /tmp/coskad_parity/smoke.yaml

Measured 2026-08-16 (20 epochs, batch 256, identical data):
    reference torch pipeline final AUC: 0.9937 (train loss 0.00303)
    coskad_tpu final AUC:               0.9920 (train loss 0.00300)
    delta: 0.17% — within BASELINE.md's 0.5% parity band.

Precision ablations on the same data (compute_dtype / freeze_bn_after set
in the generated smoke.yaml, everything else identical):
    bfloat16 compute:                   0.9922
    bfloat16 + freeze_bn_after=10:      0.9928
both inside the parity band — bfloat16 is the benched TPU precision.
"""
import sys, os, json
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import numpy as np
np.int = int
sys.path.insert(0, "/root/reference")
import torch, torch.nn as nn, torch.nn.functional as F
torch.manual_seed(0)
if not torch.cuda.is_available():
    torch.Tensor.cuda = lambda self, *a, **k: self
import types
for n_ in ["geoopt", "geoopt.manifolds", "geoopt.manifolds.stereographic",
           "geoopt.manifolds.stereographic.math"]:
    sys.modules.setdefault(n_, types.ModuleType(n_))
sys.modules["geoopt"].manifolds = sys.modules["geoopt.manifolds"]
sys.modules["geoopt.manifolds"].stereographic = sys.modules["geoopt.manifolds.stereographic"]
sys.modules["geoopt.manifolds.stereographic"].math = sys.modules["geoopt.manifolds.stereographic.math"]

from fixtures import make_synthetic_dataset
root = "/tmp/coskad_parity"
os.system(f"rm -rf {root}")
cfg_path = make_synthetic_dataset(root, seed=7)

# ---- build windows with the REFERENCE's own data machinery
import utils.dataset_utils as ref_du
from utils.eval_utils import windows_based_loss_hy, score_process
from utils.model_utils import calc_reg_loss
from models.common.components import Encoder
from sklearn.metrics import roc_auc_score

def load_split(d, stride):
    datas, metas, ids = [], [], []
    for fn in sorted(os.listdir(d)):
        scene, clip = fn.split("_")[:2]
        clip_dict = json.load(open(os.path.join(d, fn)))
        dd, mm, ii = ref_du.gen_clip_seg_data_np(
            clip_dict, start_ofst=0, seg_stride=stride, seg_len=12,
            scene_id=scene, clip_id=clip.split(".")[0])
        datas.append(dd); metas += mm; ids += ii
    segs = np.concatenate(datas, 0)
    segs = ref_du.keypoints17_to_coco18(segs)
    segs, _ = ref_du.normalize_pose(segs, vid_res=[856, 480], symm_range=True,
                                    sub_mean=True)
    segs = np.transpose(segs, (0, 3, 1, 2)).astype(np.float32)
    return segs, np.array(metas), np.array(ids)

train_x, _, _ = load_split(f"{root}/pose/training", 8)
test_x, test_meta, test_ids = load_split(f"{root}/pose/testing", 1)
print("train windows:", len(train_x), "test:", len(test_x), flush=True)

# ---- the reference model: Encoder stack + linear btlnk (STSE 'linear')
enc = Encoder(input_dim=2, layer_channels=[32, 16, 32], hidden_dimension=64,
              n_frames=12, n_joints=18, dropout=0.0)
btlnk = nn.Linear(64 * 12 * 18, 16)
model = nn.ModuleDict({"encoder": enc, "btlnk": btlnk})

def forward(x):
    h = enc(x)
    return btlnk(h.reshape(x.shape[0], -1))

# 5-transform expansion exactly like the reference dataset (i%N, i//N)
trans_list = ref_du.ae_trans_list[:5]
def get_item(x_np, idx, n):
    s, t = idx % n, idx // n
    out = ref_du.apply_pose_transform(x_np[s], trans_list[t].trans_mat)
    return out[:2]

n = len(train_x)
logical = n * 5
# center init: eval-mode full pass (reference setup semantics)
model.eval()
with torch.no_grad():
    zs = []
    for lo in range(0, logical, 512):
        idx = np.arange(lo, min(lo + 512, logical))
        batch = np.stack([get_item(train_x, i, n) for i in idx])
        zs.append(forward(torch.tensor(batch)))
    z_all = torch.cat(zs)
    c = z_all.mean(0)
    eps = 0.001
    c[(abs(c) < eps) & (c < 0)] = -eps
    c[(abs(c) < eps) & (c > 0)] = eps
print("center norm:", float(c.norm()), flush=True)

opt = torch.optim.Adam(model.parameters(), lr=1e-4)
model.train()
rng = np.random.default_rng(0)
EPOCHS = 20
for ep in range(EPOCHS):
    perm = rng.permutation(logical)
    tot = 0.0
    for lo in range(0, logical - 255, 256):
        idx = perm[lo:lo + 256]
        batch = np.stack([get_item(train_x, i, n) for i in idx])
        z = forward(torch.tensor(batch))
        loss = F.mse_loss(z, c.expand_as(z)) + 1e-6 * calc_reg_loss(model)
        opt.zero_grad(); loss.backward(); opt.step()
        tot += float(loss)
    print(f"epoch {ep+1}: loss {tot / (logical // 256):.5f}", flush=True)

# ---- reference eval: 5 transforms, nested loop, their scoring fns
model.eval()
gts = {}
for fn in sorted(os.listdir(f"{root}/gt")):
    sc, cl = int(fn.split("_")[0]), int(fn.split("_")[1].split(".")[0])
    gts[(sc, cl)] = np.load(os.path.join(f"{root}/gt", fn))

nt = len(test_x)
with torch.no_grad():
    hidden, trans_arr, metas, framess = [], [], [], []
    for t in range(5):
        for lo in range(0, nt, 512):
            sl = slice(lo, min(lo + 512, nt))
            batch = np.stack([
                ref_du.apply_pose_transform(x, trans_list[t].trans_mat)[:2]
                for x in test_x[sl]])
            hidden.append(forward(torch.tensor(batch)).numpy())
        trans_arr.append(np.full(nt, t))
        metas.append(test_meta); framess.append(test_ids)
    hidden = np.concatenate(hidden)
    trans_arr = np.concatenate(trans_arr)
    metas = np.concatenate(metas); framess = np.concatenate(framess)

loss_fn = nn.MSELoss(reduction="none")
mst, gtt = {}, {}
for t in range(5):
    condt = trans_arr == t
    h_t, m_t, f_t = hidden[condt], metas[condt], framess[condt]
    ms, dg = [], []
    for (sc, cl), gt in sorted(gts.items()):
        cond = (m_t[:, 0] == sc) & (m_t[:, 1] == cl)
        h_sc, m_sc, f_sc = h_t[cond], m_t[cond], f_t[cond]
        rows = []
        for fig in sorted(set(m_sc[:, 2])):
            cf = m_sc[:, 2] == fig
            lm = windows_based_loss_hy(c, h_sc[cf], f_sc[cf], len(gt), loss_fn)
            lm = np.where(lm == 0.0, np.nan, lm)
            fl = np.nanmean(lm, 0)
            rows.append(np.where(np.isnan(fl), 0, fl))
        cs = score_process(np.amax(np.stack(rows), 0), win_size=50)
        ms.append(cs); dg.append(gt)
    mst[t] = np.concatenate(ms); gtt[t] = np.concatenate(dg)
pds = np.mean(np.stack(list(mst.values())), 0)
ref_auc = roc_auc_score(gtt[0], pds)
print(f"REFERENCE torch pipeline final AUC: {ref_auc:.4f}", flush=True)
json.dump({"reference_auc": ref_auc}, open("/tmp/ref_parity.json", "w"))
