"""Behavior tests for the seven dataset adapters (reference
paintmind/utils/datasets.py capability), on synthetic on-disk fixtures."""

import json
import os
import zipfile

import numpy as np
import pytest
from PIL import Image

from paintmind_tpu.utils import datasets as D


def _write_jpg(path, seed=0, size=(16, 16)):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = np.random.default_rng(seed).integers(0, 255, (*size, 3),
                                               dtype=np.uint8)
    Image.fromarray(arr, 'RGB').save(path)


def _flip(img):
    return img.transpose(Image.FLIP_LEFT_RIGHT)


# -- LAION -----------------------------------------------------------------

@pytest.fixture
def laion_root(tmp_path):
    import pandas as pd
    rows = []
    for i in range(4):
        folder, key = f'{i // 2:05d}', f'{i:09d}'
        _write_jpg(str(tmp_path / 'imgs' / folder / f'{key}.jpg'), seed=i)
        rows.append({'folder': folder, 'key': key,
                     'caption': f'cap{i}', 'prompt': f'prompt{i}'})
    meta = tmp_path / 'meta.parquet'
    pd.DataFrame(rows).to_parquet(meta)
    return str(meta), str(tmp_path / 'imgs')


def test_laion(laion_root):
    meta, imgs = laion_root
    ds = D.Laion(meta, imgs, transform=_flip)
    assert len(ds) == 4
    img, cap = ds[2]
    assert cap == 'cap2' and img.size == (16, 16)


def test_laion_v2_caption_sampling(laion_root):
    meta, imgs = laion_root
    ds = D.LaionV2(meta, imgs, caption_col=('caption', 'prompt'),
                   p=(0.5, 0.5))
    np.random.seed(0)
    caps = {ds[1][1] for _ in range(40)}
    assert caps == {'cap1', 'prompt1'}
    # degenerate probabilities pick deterministically
    ds0 = D.LaionV2(meta, imgs, caption_col=('caption', 'prompt'), p=(0, 1))
    assert ds0[3][1] == 'prompt3'


# -- ImageNet ----------------------------------------------------------------

def test_imagenet_layout(tmp_path):
    for wnid, n in [('n01440764', 2), ('n01443537', 1)]:
        for j in range(n):
            _write_jpg(str(tmp_path / 'train' / wnid / f'{wnid}_{j}.JPEG'),
                       seed=j)
    ds = D.ImageNet(str(tmp_path), split='train',
                    wnid_to_name={'n01440764': 'tench'})
    assert len(ds) == 3
    np.random.seed(0)
    img, cap = ds[0]
    assert cap.endswith('tench') and any(
        cap.startswith(p) for p in D.ImageNet.prefix)
    assert ds.classes == ['tench', 'n01443537']


# -- Flickr30k ---------------------------------------------------------------

def test_flickr30k_token_file(tmp_path):
    _write_jpg(str(tmp_path / 'imgs' / 'a.jpg'))
    _write_jpg(str(tmp_path / 'imgs' / 'b.jpg'), seed=1)
    ann = tmp_path / 'results_20130124.token'
    ann.write_text('a.jpg#0\tfirst a\na.jpg#1\tsecond a\nb.jpg#0\tonly b\n',
                   encoding='utf-8')
    ds = D.Flickr30k(str(tmp_path / 'imgs'), str(ann))
    assert len(ds) == 2
    np.random.seed(0)
    caps = {ds[0][1] for _ in range(20)}
    assert caps == {'first a', 'second a'}
    assert ds[1][1] == 'only b'


# -- CoCo --------------------------------------------------------------------

def test_coco_caption_json(tmp_path):
    _write_jpg(str(tmp_path / 'train2017' / '000001.jpg'))
    ann = {
        'images': [{'id': 1, 'file_name': '000001.jpg'}],
        'annotations': [{'image_id': 1, 'caption': 'a thing'},
                        {'image_id': 1, 'caption': 'another thing'}],
    }
    os.makedirs(tmp_path / 'annotations')
    (tmp_path / 'annotations' / 'captions_train2017.json').write_text(
        json.dumps(ann))
    ds = D.CoCo(str(tmp_path), dataType='train2017')
    assert len(ds) == 1
    np.random.seed(0)
    caps = {ds[0][1] for _ in range(20)}
    assert caps == {'a thing', 'another thing'}


# -- DiffusionDB -------------------------------------------------------------

def test_diffusiondb_row_access():
    img = Image.new('RGB', (8, 8))
    rows = [{'image': img, 'prompt': 'p0'}, {'image': img, 'prompt': 'p1'}]
    ds = D.DiffusionDB(rows=rows, transform=_flip)
    assert len(ds) == 2
    out, prompt = ds[1]
    assert prompt == 'p1' and out.size == (8, 8)


# -- CelebA ------------------------------------------------------------------

def test_celeba_zip_extract_and_identities(tmp_path):
    # build the zip the adapter must auto-extract
    src = tmp_path / 'stage'
    for i in range(3):
        _write_jpg(str(src / 'img_align_celeba' / f'{i:06d}.jpg'), seed=i)
    os.makedirs(tmp_path / 'Img')
    zpath = tmp_path / 'Img' / 'img_align_celeba.zip'
    with zipfile.ZipFile(zpath, 'w') as zf:
        for i in range(3):
            name = f'img_align_celeba/{i:06d}.jpg'
            zf.write(src / name, name)
    os.makedirs(tmp_path / 'Anno')
    (tmp_path / 'Anno' / 'identity_CelebA.txt').write_text(
        '000000.jpg 7\n000001.jpg 7\n000002.jpg 3\n')
    ds = D.CelebA(str(tmp_path))
    assert len(ds) == 3
    img, ident = ds[2]
    assert int(ident) == 3 and img.size == (16, 16)
    # second construction reuses the extracted directory
    assert len(D.CelebA(str(tmp_path))) == 3


def test_celeba_missing_raises(tmp_path):
    with pytest.raises(RuntimeError, match='not found'):
        D.CelebA(str(tmp_path / 'nowhere'))
