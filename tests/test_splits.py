"""Split-parity tests: our stratified K-fold must byte-match the reference's
``data_segmentation`` (dataset.py:142-235), reproduced here in torch as an
independent oracle."""

import numpy as np
import torch

from dmf_tpu.data import (
    data_segmentation,
    data_segmentation_mask,
    stratified_fold_indices,
    train_val_indices,
)


def reference_data_segmentation(imgs, labels, segnum, classnum, fold):
    """Verbatim re-expression of dataset.py:142-174 semantics in torch."""
    np.random.seed(42)
    imgs_num, channelnum, imgsize, _ = imgs.shape
    totalimgs, totallabels, total_shuffled = [], [], []
    for i in range(classnum):
        sub = torch.where(labels == i)[0]
        total_shuffled.append(sub[np.random.permutation(sub.size(0))].tolist())
    for i in range(segnum):
        subimgs = torch.zeros(0, channelnum, imgsize, imgsize)
        sublabels = torch.zeros(0)
        for j in range(classnum):
            subnum = len(total_shuffled[j])
            foldnum = int(subnum // segnum)
            if i != segnum - 1:
                sel = total_shuffled[j][i * foldnum : (i + 1) * foldnum]
                subimgs = torch.cat((subimgs, imgs[sel]), dim=0)
                sublabels = torch.cat(
                    (sublabels, labels[total_shuffled[j]][i * foldnum : (i + 1) * foldnum]),
                    dim=0,
                )
            else:
                sel = total_shuffled[j][(segnum - 1) * foldnum :]
                subimgs = torch.cat((subimgs, imgs[sel]), dim=0)
                sublabels = torch.cat((sublabels, labels[sel]), dim=0)
        totalimgs.append(subimgs)
        totallabels.append(sublabels)
    train_imgs = torch.zeros(0, channelnum, imgsize, imgsize)
    train_labels = torch.zeros(0)
    for i in range(segnum):
        if i != fold:
            train_imgs = torch.cat((train_imgs, totalimgs[i]), dim=0)
            train_labels = torch.cat((train_labels, totallabels[i]), dim=0)
        else:
            val_imgs, val_labels = totalimgs[i], totallabels[i]
    return [train_imgs, val_imgs], [train_labels, val_labels]


class TestSplitParity:
    def test_exact_match_all_folds(self):
        rng = np.random.RandomState(7)
        n, c, s = 53, 2, 8
        imgs = rng.rand(n, c, s, s).astype(np.float32)
        labels = rng.randint(0, 4, n).astype(np.float32)
        for fold in range(5):
            ref_imgs, ref_labels = reference_data_segmentation(
                torch.tensor(imgs), torch.tensor(labels), 5, 4, fold
            )
            ours_imgs, ours_labels = data_segmentation(imgs, labels, 5, 4, fold)
            for k in range(2):
                assert np.array_equal(ours_imgs[k], ref_imgs[k].numpy()), (fold, k)
                assert np.allclose(ours_labels[k], ref_labels[k].numpy()), (fold, k)

    def test_folds_partition_dataset(self):
        labels = np.random.RandomState(1).randint(0, 4, 101)
        folds = stratified_fold_indices(labels, 5, 4)
        allidx = np.concatenate(folds)
        assert sorted(allidx.tolist()) == list(range(101))

    def test_mask_variant_aligned(self):
        rng = np.random.RandomState(3)
        imgs = rng.rand(40, 2, 4, 4).astype(np.float32)
        masks = rng.rand(40, 1, 4, 4).astype(np.float32)
        labels = rng.randint(0, 4, 40).astype(np.int64)
        im, mk, lb = data_segmentation_mask(imgs, masks, labels, 5, 4, 2)
        tr, va = train_val_indices(labels, 5, 4, 2)
        assert np.array_equal(im[0], imgs[tr])
        assert np.array_equal(mk[1], masks[va])
        assert np.array_equal(lb[0], labels[tr])
