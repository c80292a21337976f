"""Dataset adapters — the reference's seven map-style datasets
(paintmind/utils/datasets.py) re-implemented without the torch data stack.
Each returns ``(img, caption)`` (CelebA returns ``(img, id)``), applying the
given transform (utils/transform) to a PIL image.

Differences from the reference, by necessity of the environment:
  * ImageNet (reference :75-91 uses torchvision.datasets.ImageNet) reads the
    standard ``<root>/<split>/<wnid>/*.JPEG`` layout directly; class names
    come from an optional ``wnid_to_name`` mapping (or the wnid itself).
  * CoCo (reference :132-154 uses pycocotools) parses the captions
    annotation JSON with the stdlib — same files, same sampling behavior.
  * Flickr30k (reference :94-109 uses torchvision) parses the
    ``results_20130124.token`` annotation format directly.
"""

from __future__ import annotations

import json
import os
import zipfile

import numpy as np
from PIL import Image


def unzip_file(zip_src, tgt_dir):
    """(reference datasets.py:11-17)."""
    if not zipfile.is_zipfile(zip_src):
        raise RuntimeError('This is not zip file.')
    with zipfile.ZipFile(zip_src, 'r') as fz:
        for file in fz.namelist():
            fz.extract(file, tgt_dir)


def _open_rgb(path):
    return Image.open(path).convert('RGB')


class Laion:
    """(reference datasets.py:20-42): parquet metadata + <folder>/<key>.jpg."""

    def __init__(self, metadata_path, folder_path, fid='folder', key='key',
                 caption_col='caption', transform=None):
        import pandas as pd
        self.df = pd.read_parquet(metadata_path)
        self.fpath = folder_path
        self.fid, self.key = fid, key
        self.caption_col = caption_col
        self.transform = transform

    def __getitem__(self, idx):
        fid = self.df[self.fid][idx]
        key = self.df[self.key][idx]
        img = _open_rgb(f'{self.fpath}/{fid}/{key}.jpg')
        caption = self.df[self.caption_col][idx]
        if self.transform is not None:
            img = self.transform(img)
        return img, caption

    def __len__(self):
        return len(self.df)


class LaionV2:
    """(reference datasets.py:45-72): multi-caption columns with sampling
    probabilities."""

    def __init__(self, metadata_path, folder_path, fid='folder', key='key',
                 caption_col=('caption', 'prompt'), p=(0.2, 0.8),
                 transform=None):
        import pandas as pd
        self.df = pd.read_parquet(metadata_path)
        self.fpath = folder_path
        self.fid, self.key = fid, key
        self.caption_col = list(caption_col)
        self.p = list(p)
        self.transform = transform

    def __getitem__(self, idx):
        fid = self.df[self.fid][idx]
        key = self.df[self.key][idx]
        img = _open_rgb(f'{self.fpath}/{fid}/{key}.jpg')
        prompts = [self.df[col][idx] for col in self.caption_col]
        caption = np.random.choice(prompts, p=self.p)
        if self.transform is not None:
            img = self.transform(img)
        return img, caption

    def __len__(self):
        return len(self.df)


class ImageNet:
    """(reference datasets.py:75-91): images with 'an image of <class>'-style
    captions.  Reads <root>/<split>/<wnid>/*; pass wnid_to_name (dict or
    path to a json/txt mapping) for human-readable class names."""

    prefix = ['an image of ', 'a picture of ']

    def __init__(self, root, split='train', transform=None, wnid_to_name=None):
        split_dir = os.path.join(root, split)
        self.samples = []
        wnids = sorted(d for d in os.listdir(split_dir)
                       if os.path.isdir(os.path.join(split_dir, d)))
        for wnid in wnids:
            d = os.path.join(split_dir, wnid)
            for fname in sorted(os.listdir(d)):
                self.samples.append((os.path.join(d, fname), wnid))
        if isinstance(wnid_to_name, str):
            with open(wnid_to_name) as f:
                wnid_to_name = json.load(f)
        self.wnid_to_name = wnid_to_name or {}
        self.classes = [self.wnid_to_name.get(w, w) for w in wnids]
        self.transform = transform

    def __getitem__(self, idx):
        path, wnid = self.samples[idx]
        image = _open_rgb(path)
        name = self.wnid_to_name.get(wnid, wnid)
        if isinstance(name, (list, tuple)):
            name = np.random.choice(list(name))
        caption = np.random.choice(self.prefix) + str(name)
        if self.transform is not None:
            image = self.transform(image)
        return image, caption

    def __len__(self):
        return len(self.samples)


class Flickr30k:
    """(reference datasets.py:94-109): random caption per image from the
    results_20130124.token annotation file (lines: 'img.jpg#i\\tcaption')."""

    def __init__(self, img_dir, ann_file, transform=None):
        self.img_dir = img_dir
        anns = {}
        with open(ann_file, encoding='utf-8') as f:
            for line in f:
                head, _, caption = line.strip().partition('\t')
                img_id = head.split('#')[0]
                anns.setdefault(img_id, []).append(caption)
        self.items = sorted(anns.items())
        self.transform = transform

    def __getitem__(self, idx):
        img_id, captions = self.items[idx]
        img = _open_rgb(os.path.join(self.img_dir, img_id))
        caption = np.random.choice(captions)
        if self.transform is not None:
            img = self.transform(img)
        return img, caption

    def __len__(self):
        return len(self.items)


class DiffusionDB:
    """(reference datasets.py:112-129): HF datasets poloclub/diffusiondb."""

    def __init__(self, version='large_random_100k', transform=None):
        from datasets import load_dataset
        self.dataset = load_dataset('poloclub/diffusiondb', version)['train']
        self.transform = transform

    def __getitem__(self, idx):
        data = self.dataset[idx]
        image, prompt = data['image'], data['prompt']
        if self.transform is not None:
            image = self.transform(image)
        return image, prompt

    def __len__(self):
        return len(self.dataset)


class CoCo:
    """(reference datasets.py:132-154): COCO captions; the annotation JSON
    is parsed directly (images + annotations tables) — same behavior as the
    pycocotools path: random caption among the image's annotations."""

    def __init__(self, root, dataType='train2017', annType='captions',
                 transform=None):
        self.img_dir = f'{root}/{dataType}'
        ann_file = f'{root}/annotations/{annType}_{dataType}.json'
        with open(ann_file) as f:
            ann = json.load(f)
        self.img_info = {im['id']: im['file_name'] for im in ann['images']}
        self.img_anns = {}
        for a in ann['annotations']:
            self.img_anns.setdefault(a['image_id'], []).append(a['caption'])
        self.imgids = sorted(self.img_info)
        self.transform = transform

    def __getitem__(self, idx):
        imgid = self.imgids[idx]
        img = _open_rgb(os.path.join(self.img_dir, self.img_info[imgid]))
        ann = np.random.choice(self.img_anns.get(imgid, ['']))
        if self.transform is not None:
            img = self.transform(img)
        return img, ann

    def __len__(self):
        return len(self.imgids)


class CelebA:
    """(reference datasets.py:157-196): zip auto-extract + identity
    annotations; returns (img, identity_id)."""

    def __init__(self, root, type='identity', transform=None):
        ann_dir = os.path.join(root, 'Anno')
        base_dir = os.path.join(root, 'Img')
        zfile_path = os.path.join(base_dir, 'img_align_celeba.zip')
        self.img_dir = os.path.join(base_dir, 'img_align_celeba')
        if os.path.exists(self.img_dir):
            pass
        elif os.path.exists(zfile_path):
            unzip_file(zfile_path, base_dir)
        else:
            raise RuntimeError('Dataset not found.')
        self.imgs = sorted(os.listdir(self.img_dir))
        self.img2id = {}
        if type == 'identity':
            with open(os.path.join(ann_dir, 'identity_CelebA.txt')) as f:
                for line in f:
                    name, ident = line.strip().split(' ')
                    self.img2id[name] = int(ident)
        self.transform = transform

    def __getitem__(self, idx):
        img_name = self.imgs[idx]
        img = _open_rgb(os.path.join(self.img_dir, img_name))
        ann = self.img2id.get(img_name, 0)
        if self.transform is not None:
            img = self.transform(img)
        return img, np.int64(ann)

    def __len__(self):
        return len(self.imgs)
