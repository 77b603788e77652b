import cv2
import numpy as np

from fgn_tpu.data.check_corrupt import check_dir


def test_detects_corrupt_and_passes_good(tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    img = np.full((16, 16, 3), 128, np.uint8)
    cv2.imwrite(str(d / "good.jpg"), img)
    cv2.imwrite(str(d / "good.png"), img)
    (d / "truncated.jpg").write_bytes(b"\xff\xd8\xff\xe0junk")
    (d / "empty.jpg").write_bytes(b"")
    bad = check_dir(str(d), verbose=False)
    names = {n for n, _ in bad}
    assert names == {"truncated.jpg", "empty.jpg"}
