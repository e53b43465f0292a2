// Ratio comparison harness: train on newline-delimited values from a file,
// compress each value, print JSON totals. Mirrors fsst_spark's unit of work
// (train on column values, compress per value).
use std::env;
use std::fs;

fn main() {
    let args: Vec<String> = env::args().collect();
    let data = fs::read(&args[1]).expect("read input");
    let values: Vec<&[u8]> = data.split(|b| *b == b'\n').collect();
    let compressor = fsst::Compressor::train(&values);
    let mut in_bytes = 0usize;
    let mut out_bytes = 0usize;
    for v in &values {
        in_bytes += v.len();
        out_bytes += compressor.compress(v).len();
    }
    let table_bytes = compressor.symbol_table().len() * 8 + compressor.symbol_lengths().len();
    println!(
        "{{\"n_values\": {}, \"in_bytes\": {}, \"out_bytes\": {}, \"table_bytes\": {}}}",
        values.len(), in_bytes, out_bytes, table_bytes
    );
}
