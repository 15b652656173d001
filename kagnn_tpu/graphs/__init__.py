from kagnn_tpu.graphs.batch import GraphBatch, PadSpec, batch_graphs, pad_spec_for, single_graph
