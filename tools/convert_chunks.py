"""Convert reference `.torch` dataset chunks to native `.pfchunk` containers.

The `.pfchunk` format (pf3plat_tpu/native/pfchunk.cc) is the framework's
torch-free ingestion path: an mmap'd container read by the C++ reader via
ctypes, with no pickle deserialization on the training hot path. This tool
performs the one-time offline conversion of the reference's released
RE10K/ACID/DL3DV chunks (`src/dataset/dataset_re10k.py` container layout).

Usage: python tools/convert_chunks.py SRC_DIR DST_DIR [--stage train test]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def convert_file(src: Path, dst: Path) -> int:
    import numpy as np
    import torch

    from pf3plat_tpu.native.pfchunk import write_pfchunk

    chunk = torch.load(src, map_location="cpu", weights_only=False)
    scenes = []
    for ex in chunk:
        scenes.append({
            "key": ex["key"],
            "cameras": np.asarray(ex["cameras"], np.float32),
            "images": [np.asarray(img, np.uint8).tobytes()
                       for img in ex["images"]],
        })
    dst.parent.mkdir(parents=True, exist_ok=True)
    write_pfchunk(dst, scenes)
    return len(scenes)


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    stages = ["train", "test"]
    if "--stage" in argv:
        i = argv.index("--stage")
        stages = argv[i + 1:]
        argv = argv[:i]
    if len(argv) != 2:
        raise SystemExit(__doc__)
    src_root, dst_root = Path(argv[0]), Path(argv[1])
    total = 0
    for stage in stages:
        for src in sorted((src_root / stage).glob("*.torch")):
            dst = dst_root / stage / (src.stem + ".pfchunk")
            n = convert_file(src, dst)
            total += n
            print(f"{src} -> {dst} ({n} scenes)")
    print(f"converted {total} scenes")


if __name__ == "__main__":
    main()
