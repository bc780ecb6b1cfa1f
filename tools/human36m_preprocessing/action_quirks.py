"""Human3.6M action-name quirk tables (corpus facts).

The H36M video dumps name sequences ``<Action>-<trial>`` while the
una-dinosauria pose release and the ground-truth segment .mat files use
``<Action> <n>`` stems whose trial NUMBERING IS SWAPPED for many
(subject, action) pairs.  These mappings are facts about the released
corpus — they cannot be derived and must match the reference tables
(/root/reference/mvn/datasets/human36m_preprocessing/
action_to_una_dinosauria.py:1-156, action_to_bbox_filename.py) exactly,
or poses/bboxes get paired with the wrong video (including for S9/S11,
the evaluation subjects).

Default rule (applies to every pair not listed): the stem is
``action.replace('-', ' ')``.
"""

from __future__ import annotations

# H36M action name -> una-dinosauria pose file stem, per subject.
# Only pairs that deviate from the default rule appear.
ACTION_TO_POSE_STEM = {
    "S1": {
        "Discussion-2": "Discussion",
        "Directions-2": "Directions",
        "Eating-1": "Eating 2",
        "Eating-2": "Eating",
        "Greeting-2": "Greeting",
        "Phoning-2": "Phoning",
        "Posing-2": "Posing",
        "Purchases-2": "Purchases",
        "SittingDown-1": "SittingDown 2",
        "SittingDown-2": "SittingDown",
        "Smoking-2": "Smoking",
        "TakingPhoto-1": "Photo 1",
        "TakingPhoto-2": "Photo",
        "Waiting-2": "Waiting",
        "Walking-2": "Walking",
        "WalkingDog-1": "WalkDog 1",
        "WalkingDog-2": "WalkDog",
        "WalkingTogether-1": "WalkTogether 1",
        "WalkingTogether-2": "WalkTogether",
    },
    "S5": {
        "Discussion-1": "Discussion 2",
        "Discussion-2": "Discussion 3",
        "Eating-1": "Eating 1",
        "Eating-2": "Eating",
        "Phoning-2": "Phoning",
        "Posing-2": "Posing",
        "Purchases-2": "Purchases",
        "Sitting-2": "Sitting",
        "SittingDown-1": "SittingDown",
        "SittingDown-2": "SittingDown 1",
        "Smoking-2": "Smoking",
        "TakingPhoto-1": "Photo",
        "TakingPhoto-2": "Photo 2",
        "Waiting-2": "Waiting 2",
        "Walking-2": "Walking",
        "WalkingDog-1": "WalkDog 1",
        "WalkingDog-2": "WalkDog",
        "WalkingTogether-1": "WalkTogether 1",
        "WalkingTogether-2": "WalkTogether",
    },
    "S6": {
        "Directions-2": "Directions",
        "Discussion-1": "Discussion 1",
        "Discussion-2": "Discussion",
        "Eating-1": "Eating 1",
        "Eating-2": "Eating 2",
        "Greeting-2": "Greeting",
        "Phoning-2": "Phoning",
        "Posing-1": "Posing 2",
        "Posing-2": "Posing",
        "Purchases-2": "Purchases",
        "SittingDown-1": "SittingDown 1",
        "SittingDown-2": "SittingDown",
        "Smoking-2": "Smoking",
        "TakingPhoto-1": "Photo",
        "TakingPhoto-2": "Photo 1",
        "Waiting-1": "Waiting 3",
        "Waiting-2": "Waiting",
        "Walking-2": "Walking",
        "WalkingDog-1": "WalkDog 1",
        "WalkingDog-2": "WalkDog",
        "WalkingTogether-1": "WalkTogether 1",
        "WalkingTogether-2": "WalkTogether",
    },
    "S7": {
        "Directions-2": "Directions",
        "Discussion-2": "Discussion",
        "Eating-2": "Eating",
        "Greeting-2": "Greeting",
        "Phoning-1": "Phoning 2",
        "Phoning-2": "Phoning",
        "Posing-2": "Posing",
        "Purchases-2": "Purchases",
        "Sitting-2": "Sitting",
        "SittingDown-1": "SittingDown",
        "SittingDown-2": "SittingDown 1",
        "Smoking-2": "Smoking",
        "TakingPhoto-1": "Photo",
        "TakingPhoto-2": "Photo 1",
        "WalkingDog-1": "WalkDog 1",
        "WalkingDog-2": "WalkDog",
        "WalkingTogether-1": "WalkTogether 1",
        "WalkingTogether-2": "WalkTogether",
    },
    "S8": {
        "Directions-2": "Directions",
        "Discussion-2": "Discussion",
        "Eating-2": "Eating",
        "Greeting-2": "Greeting",
        "Phoning-1": "Phoning 1",
        "Phoning-2": "Phoning",
        "Posing-2": "Posing",
        "Purchases-2": "Purchases",
        "Sitting-2": "Sitting",
        "SittingDown-1": "SittingDown",
        "SittingDown-2": "SittingDown 1",
        "Smoking-2": "Smoking",
        "TakingPhoto-1": "Photo 1",
        "TakingPhoto-2": "Photo",
        "Waiting-2": "Waiting",
        "Walking-2": "Walking",
        "WalkingDog-1": "WalkDog 1",
        "WalkingDog-2": "WalkDog",
        "WalkingTogether-1": "WalkTogether 1",
        "WalkingTogether-2": "WalkTogether 2",
    },
    "S9": {
        "Directions-2": "Directions",
        "Discussion-2": "Discussion 2",
        "Eating-2": "Eating",
        "Greeting-2": "Greeting",
        "Phoning-1": "Phoning 1",
        "Phoning-2": "Phoning",
        "Posing-2": "Posing",
        "Purchases-2": "Purchases",
        "Sitting-2": "Sitting",
        "SittingDown-1": "SittingDown",
        "SittingDown-2": "SittingDown 1",
        "Smoking-2": "Smoking",
        "TakingPhoto-1": "Photo 1",
        "TakingPhoto-2": "Photo",
        "Waiting-2": "Waiting",
        "Walking-2": "Walking",
        "WalkingDog-1": "WalkDog 1",
        "WalkingDog-2": "WalkDog",
        "WalkingTogether-1": "WalkTogether 1",
        "WalkingTogether-2": "WalkTogether",
    },
    "S11": {
        "Directions-2": "Directions",
        "Discussion-2": "Discussion 2",
        "Eating-2": "Eating",
        "Greeting-1": "Greeting 2",
        "Greeting-2": "Greeting",
        "Phoning-1": "Phoning 3",
        "Phoning-2": "Phoning 2",
        "Posing-2": "Posing",
        "Purchases-2": "Purchases",
        "Sitting-2": "Sitting",
        "SittingDown-1": "SittingDown",
        "SittingDown-2": "SittingDown 1",
        "Smoking-1": "Smoking 2",
        "Smoking-2": "Smoking",
        "TakingPhoto-1": "Photo 1",
        "TakingPhoto-2": "Photo",
        "Waiting-2": "Waiting",
        "Walking-2": "Walking",
        "WalkingDog-1": "WalkDog 1",
        "WalkingDog-2": "WalkDog",
        "WalkingTogether-1": "WalkTogether 1",
        "WalkingTogether-2": "WalkTogether",
    },
}


def action_to_pose_stem(subject: str, action: str) -> str:
    """una-dinosauria pose file stem for an H36M (subject, action)."""
    return ACTION_TO_POSE_STEM.get(subject, {}).get(
        action, action.replace("-", " "))


def _bbox_table():
    """The ground-truth-segment .mat stems: identical to the pose table
    except S1's TakingPhoto/WalkingDog mats keep the original base names
    (the only delta between the two reference tables)."""
    table = {s: dict(m) for s, m in ACTION_TO_POSE_STEM.items()}
    s1 = table["S1"]
    del s1["TakingPhoto-1"], s1["WalkingDog-1"]  # default rule applies
    s1["TakingPhoto-2"] = "TakingPhoto"
    s1["WalkingDog-2"] = "WalkingDog"
    return table


ACTION_TO_BBOX_STEM = _bbox_table()


def action_to_bbox_stem(subject: str, action: str) -> str:
    """Segment-mask .mat stem for an H36M (subject, action)."""
    return ACTION_TO_BBOX_STEM.get(subject, {}).get(
        action, action.replace("-", " "))
