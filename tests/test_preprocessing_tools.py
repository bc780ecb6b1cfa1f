"""Preprocessing tool tests: the S9/S11 action-name quirk tables and the
pose-file resolution order (corpus facts from the reference's
action_to_una_dinosauria.py / action_to_bbox_filename.py)."""

import os
import sys

TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "human36m_preprocessing")
sys.path.insert(0, TOOLS)

from action_quirks import (  # noqa: E402
    action_to_bbox_stem,
    action_to_pose_stem,
)


def test_known_quirky_pose_pairs():
    # The swapped-trial facts for the evaluation subjects S9/S11.
    assert action_to_pose_stem("S11", "Greeting-1") == "Greeting 2"
    assert action_to_pose_stem("S11", "Greeting-2") == "Greeting"
    assert action_to_pose_stem("S11", "Phoning-1") == "Phoning 3"
    assert action_to_pose_stem("S11", "Phoning-2") == "Phoning 2"
    assert action_to_pose_stem("S11", "Smoking-1") == "Smoking 2"
    assert action_to_pose_stem("S9", "SittingDown-1") == "SittingDown"
    assert action_to_pose_stem("S9", "SittingDown-2") == "SittingDown 1"
    assert action_to_pose_stem("S9", "Discussion-2") == "Discussion 2"
    assert action_to_pose_stem("S9", "TakingPhoto-1") == "Photo 1"
    # Train-subject quirks.
    assert action_to_pose_stem("S5", "Discussion-1") == "Discussion 2"
    assert action_to_pose_stem("S5", "Discussion-2") == "Discussion 3"
    assert action_to_pose_stem("S6", "Waiting-1") == "Waiting 3"
    assert action_to_pose_stem("S1", "SittingDown-1") == "SittingDown 2"
    assert action_to_pose_stem("S8", "WalkingTogether-2") == "WalkTogether 2"
    # Default rule: pairs not in the table map hyphen -> space.
    assert action_to_pose_stem("S9", "Walking-1") == "Walking 1"
    assert action_to_pose_stem("S1", "Directions-1") == "Directions 1"


def test_bbox_table_s1_delta():
    # The .mat stems equal the pose stems everywhere except S1's
    # TakingPhoto / WalkingDog, which keep the original base names.
    assert action_to_bbox_stem("S1", "TakingPhoto-2") == "TakingPhoto"
    assert action_to_bbox_stem("S1", "TakingPhoto-1") == "TakingPhoto 1"
    assert action_to_bbox_stem("S1", "WalkingDog-2") == "WalkingDog"
    assert action_to_bbox_stem("S1", "WalkingDog-1") == "WalkingDog 1"
    # Everyone else matches the pose table.
    for subject in ("S5", "S6", "S7", "S8", "S9", "S11"):
        for action in ("TakingPhoto-1", "WalkingDog-2", "Greeting-1",
                       "SittingDown-2"):
            assert (action_to_bbox_stem(subject, action)
                    == action_to_pose_stem(subject, action))


def test_resolve_pose_file_priority(tmp_path):
    """override > quirk table > probe (generate_labels.py docstring)."""
    import generate_labels as gl

    poses = tmp_path / "S11" / "MyPoses" / "3D_positions"
    poses.mkdir(parents=True)
    # S11 Greeting-1 must pick 'Greeting 2' (quirk) even though a
    # naive 'Greeting 1' file also exists.
    (poses / "Greeting 1.h5").touch()
    (poses / "Greeting 2.h5").touch()
    got = gl.resolve_pose_file(str(poses), "S11", "Greeting-1", set(), {})
    assert os.path.basename(got) == "Greeting 2.h5"

    # Explicit override wins over the quirk table.
    got = gl.resolve_pose_file(str(poses), "S11", "Greeting-1", set(),
                               {"Greeting-1": "Greeting 1"})
    assert os.path.basename(got) == "Greeting 1.h5"

    # Probe fallback: unknown layout without a quirk entry.
    (poses / "Jumping 1.h5").touch()
    got = gl.resolve_pose_file(str(poses), "S11", "Jumping-1", set(), {})
    assert os.path.basename(got) == "Jumping 1.h5"
