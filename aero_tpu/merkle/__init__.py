from .tree import (commit_rows, commit_columns, commit_digests,
                   DeviceMerkleTree, ResidentMerkleTree)
