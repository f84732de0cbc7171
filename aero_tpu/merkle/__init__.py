from .tree import commit_rows, commit_digests, DeviceMerkleTree
