"""SHREC16 dataset wrapper. Ref ``kaolin/io/shrec.py:97``.
Layout: <root>/<category>/<train|test>/<name>.obj."""

import os

__all__ = ["SHREC16"]


class SHREC16:
    def __init__(self, root, categories=None, split="train"):
        assert split in ("train", "test", "val")
        self.root = root
        if categories is None:
            categories = sorted(d for d in os.listdir(root)
                                if os.path.isdir(os.path.join(root, d)))
        self.categories = categories
        self.paths = []
        self.labels = []
        for ci, cat in enumerate(categories):
            d = os.path.join(root, cat, split)
            if not os.path.isdir(d):
                continue
            for fn in sorted(os.listdir(d)):
                if fn.endswith(".obj"):
                    self.paths.append(os.path.join(d, fn))
                    self.labels.append(ci)

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index):
        from kaolin_tpu.io import obj
        mesh = obj.import_mesh(self.paths[index], triangulate=True)
        return {"mesh": mesh,
                "category": self.categories[self.labels[index]],
                "label": self.labels[index]}
