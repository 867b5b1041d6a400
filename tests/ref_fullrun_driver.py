"""Subprocess driver that runs a REFERENCE tabular trainer's main()
verbatim on CPU (full-run convergence A/B, VERDICT r4 #1).

The reference mains are torchrun/CUDA-bound; this driver supplies the
minimal environment shims so the UNMODIFIED training code runs to
completion single-process on CPU:
  - torch.distributed backend nccl -> gloo (world=1; the collectives in
    misc.py:77-91 / the evaluate() all_gathers become identities)
  - torch.cuda.set_device -> no-op, Tensor.cuda -> identity (the trad
    Critic/Reward build index helpers with .cuda(), ppo_trad.py:157+)
  - torchvision stub (imported by pointwise_trad/reward_trad, unused on
    the tabular path; the package is not in this image)
  - DataLoader num_workers -> 0 (the hardcoded 32 workers of
    get_dataloader would thrash a 1-core host)

None of these change the training math — they are placement/launch
shims only. Run (cwd must be the reference root for the CWD-relative
token-map import, tencentpretrain/utils/constants.py:4):

    python ref_fullrun_driver.py <pointwise|reward|ppo> <flags...>
"""

import importlib
import sys
import types

STAGE_MODULES = {
    "pointwise": "pointwise_trad",
    "reward": "reward_trad",
    "ppo": "ppo_trad",
}


def main():
    stage, rest = sys.argv[1], sys.argv[2:]
    mod_name = STAGE_MODULES[stage]

    import torch
    import torch.distributed as dist

    torch.cuda.set_device = lambda *a, **k: None
    torch.Tensor.cuda = lambda self, *a, **k: self
    _ipg = dist.init_process_group

    def ipg(backend=None, *a, **k):
        k.pop("backend", None)
        return _ipg("gloo", *a, **k)

    dist.init_process_group = ipg

    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    tvio = types.ModuleType("torchvision.io")
    tvim = types.ModuleType("torchvision.io.image")
    tvio.read_image = None
    tvim.ImageReadMode = None
    tvio.image = tvim
    tv.io = tvio
    tv.transforms = tr
    sys.modules.update({
        "torchvision": tv, "torchvision.transforms": tr,
        "torchvision.io": tvio, "torchvision.io.image": tvim,
    })

    sys.path.insert(0, "finetune")
    sys.path.insert(0, ".")
    sys.argv = [mod_name + ".py"] + rest
    mod = importlib.import_module(mod_name)

    import torch.utils.data as tud

    _DL = tud.DataLoader

    def DL(*a, **k):
        k["num_workers"] = 0
        return _DL(*a, **k)

    mod.DataLoader = DL
    mod.main()
    print("REF_STAGE_DONE", stage, flush=True)


if __name__ == "__main__":
    main()
