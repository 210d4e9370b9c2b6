"""HouseReader tests on a synthetic .house file (public Matterport format)."""

import numpy as np

from avlen_tpu.sim.mp3d_utils import CATEGORY_INDEX_MAPPING, HouseReader

HOUSE = """\
H name 0 0 0 0 0 0 11 1 1 2 1 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0
L 0 1 0 label 0 0 0 0 0 0 0 0 0 0 0 0 0
R 0 0 0 0 b 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0
C 3 3 chair 3 chair 0 0 0 0 0
C 7 7 bath#tub 25 bathtub 0 0 0 0 0
O 0 0 3 1.0 2.0 3.0 1 0 0 0 1 0 0.5 0.5 0.5 0 0 0 0 0 0 0 0
O 1 0 7 4.0 5.0 6.0 1 0 0 0 1 0 1.0 1.0 1.0 0 0 0 0 0 0 0 0
"""


def test_house_reader(tmp_path):
    path = tmp_path / "scene.house"
    path.write_text(HOUSE)
    reader = HouseReader(str(path))
    assert len(reader.categories) == 2
    assert len(reader.objects) == 2
    assert reader.num_levels == 1 and reader.num_regions == 1

    mapping = reader.compute_object_to_category_index_mapping()
    assert mapping[0] == 3  # chair → mpcat40 3
    assert mapping[1] == 25

    assert reader.object_task_category(reader.objects[0]) == CATEGORY_INDEX_MAPPING["chair"]
    assert reader.object_task_category(reader.objects[1]) == CATEGORY_INDEX_MAPPING["bathtub"]
    chairs = reader.objects_in_category(CATEGORY_INDEX_MAPPING["chair"])
    assert len(chairs) == 1
    np.testing.assert_allclose(chairs[0].center, [1.0, 2.0, 3.0])
