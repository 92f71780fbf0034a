"""End-to-end num_classes=2 through the CLI: the reference's per-class mask
layout (masks/<c>/<id>.png stacked along channel, reference dataset.py:60-64)
trained and evaluated with per-class output dirs (reference val.py:84-105)."""

import cv2
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute: see pyproject fast lane


@pytest.fixture(scope="module")
def synth2_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli2c")
    rng = np.random.default_rng(3)
    img_dir = root / "inputs" / "synth2" / "images"
    img_dir.mkdir(parents=True)
    mask_dirs = []
    for c in range(2):
        d = root / "inputs" / "synth2" / "masks" / str(c)
        d.mkdir(parents=True)
        mask_dirs.append(d)
    yy, xx = np.mgrid[0:32, 0:32]
    for i in range(12):
        img = rng.integers(0, 60, (32, 32, 3), dtype=np.uint8)
        cy, cx = rng.integers(8, 24, 2)
        disk = (((yy - cy) ** 2 + (xx - cx) ** 2) < 30).astype(np.uint8) * 255
        box = np.zeros((32, 32), np.uint8)
        y0, x0 = rng.integers(2, 18, 2)
        box[y0:y0 + 9, x0:x0 + 9] = 255
        # class 0 = bright disks, class 1 = mid-gray boxes
        img[disk > 0] = 230
        img[(box > 0) & (disk == 0)] = 130
        cv2.imwrite(str(img_dir / f"im{i:02d}.png"), img)
        cv2.imwrite(str(mask_dirs[0] / f"im{i:02d}.png"), disk)
        cv2.imwrite(str(mask_dirs[1] / f"im{i:02d}.png"), box)
    return root


def test_two_class_train_val(synth2_root):
    import train as train_cli
    import val as val_cli

    best = train_cli.main([
        f"--data_dir={synth2_root / 'inputs'}",
        f"--output_dir={synth2_root / 'models'}",
        "--dataset=synth2", "--num_classes=2",
        "--input_w=32", "--input_h=32", "--epochs=2", "--batch_size=4",
        "--precision=fp32", "--optimizer=Adam", "--arch=UNet"])
    assert np.isfinite(best)

    iou = val_cli.main([
        "--name=synth2_UNet_woDS",
        f"--data_dir={synth2_root / 'inputs'}",
        f"--output_dir={synth2_root / 'models'}",
        f"--save_dir={synth2_root / 'outputs'}"])
    assert iou == pytest.approx(best, abs=1e-4)
    # per-class output dirs, one mask image per val sample in each
    for c in range(2):
        outs = list((synth2_root / "outputs" / "synth2_UNet_woDS" / str(c)).iterdir())
        assert len(outs) == 3  # 20% of 12 -> 3 val images
    # the two classes are distinct targets: written masks must differ
    a = cv2.imread(str(sorted((synth2_root / "outputs" / "synth2_UNet_woDS" / "0").iterdir())[0].as_posix()), 0)
    b = cv2.imread(str(sorted((synth2_root / "outputs" / "synth2_UNet_woDS" / "1").iterdir())[0].as_posix()), 0)
    assert a is not None and b is not None and a.shape == (32, 32)
    assert not np.array_equal(a, b)
