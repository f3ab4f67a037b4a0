#!/usr/bin/env python
"""Download the MULTIPOINT dataset (reference download_multipoint_data.py).

NOTE: needs network egress; in air-gapped environments place the HDF5 files
under --target-dir manually."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BASE_URL = 'http://robotics.ethz.ch/~asl-datasets/2020_ALTAIR_multispectral_dataset/'


def download(url, target_dir, overwrite=False, chunk_size=1024 * 1024):
    import requests
    from tqdm import tqdm
    target = os.path.join(target_dir, os.path.basename(url))
    if os.path.exists(target) and not overwrite:
        print(f'{target} exists; use -f to overwrite')
        return target
    os.makedirs(target_dir, exist_ok=True)
    size = int(requests.head(url).headers.get('Content-Length', 0))
    with requests.get(url, stream=True) as r, open(target, 'wb') as f, \
            tqdm(unit='B', unit_scale=True, total=size,
                 desc=os.path.basename(url)) as bar:
        for chunk in r.iter_content(chunk_size=chunk_size):
            bar.update(f.write(chunk))
    return target


def main():
    parser = argparse.ArgumentParser(description='Download multipoint dataset')
    parser.add_argument('--test-url', default=BASE_URL + 'test.hdf5')
    parser.add_argument('--train-url', default=BASE_URL + 'training.hdf5')
    parser.add_argument('--labels-url', default=BASE_URL + 'labels_training.hdf5')
    parser.add_argument('-f', '--force-overwrite', action='store_true')
    parser.add_argument('-d', '--target-dir', default='data')
    args = parser.parse_args()
    for url in (args.test_url, args.train_url, args.labels_url):
        download(url, args.target_dir, args.force_overwrite)


if __name__ == '__main__':
    main()
