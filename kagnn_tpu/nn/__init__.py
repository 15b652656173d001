from kagnn_tpu.nn.convs import (GCNConv, GATConv, GINConv, GINEConv,
                                dense_transform, kan_transform,
                                fastkan_transform, global_add_pool,
                                global_mean_pool)
from kagnn_tpu.nn.mlp import MLP, TorchLinear
from kagnn_tpu.nn.encoders import AtomEncoder, BondEncoder
from kagnn_tpu.nn.kagnn import (FASTKAGATConv, FASTKAGCNConv,
                                GIFASTKANLayer, GIKANLayer, KAGATConv,
                                KAGCNConv, KAGINEConv, make_fastkan, make_kan,
                                make_mlp)
