// Miden-assembly-subset virtual machine: assembler + executor (native core).
//
// The reference's VM is the forked miden-vm processor (submodule not
// vendored; reference call sites: miden_processor::execute at
// aero-sdk/miden-wasm/src/proving_worker.rs:226, program assembly at
// miden-proof-generator/src/main.rs:55-74). This is a from-scratch
// re-design covering the miden v0.3 field/stack instruction families
// (see OPS below), advice-tape nondeterminism, and structured control
// flow (repeat.N unrolling, while.true, if.true/else, proc/exec),
// producing an execution trace in the aero-tpu Miden-compatible layout:
//
//   column 0      : clk
//   columns 1-6   : opcode group selectors g0..g5 (one-hot)
//   columns 7-14  : opcode member selectors m0..m7 (one-hot)
//                   op = group*8 + member  (48-op capacity, 32 defined)
//   column 15     : immediate value (push)
//   columns 16-31 : stack s0..s15 (s0 = top)
//   column 32     : virtual stack depth (window depth, constant 16)
//   column 33     : overflow net counter (#window-down - #window-up ops,
//                   as a field element; tracks the overflow-table size)
//   column 34     : helper column h0 (inverse witness for eq/neq/eqz/inv)
//   column 35     : b1 — address of the newest overflow-table row (0=empty)
//   column 36     : e  — table-emptiness flag (1 iff b1 == 0)
//   column 37     : k  — inverse witness b1^-1 (0 when empty)
//   columns 38-71 : reserved chiplet columns (zero; see aero_tpu/air/miden.py
//                   for the constraint inventory and documented gaps)
//
// The two-level selector encoding keeps the AIR at the reference
// ProcessorAir's exact proof shape (72 main cols, 49 transition
// constraints): booleanity costs 6+8 constraints instead of one per op.
//
// Immediate-operand forms (add.N, sub.N, mul.N, div.N, eq.N, neq.N,
// u32add.N, ..., mem.load.ADDR, mem.store.ADDR), div and u32split desugar
// in the assembler to primitive sequences. The u32 family uses
// checked-wrapping semantics (trap on non-u32 operands, results mod 2^32);
// mem.load/mem.store give word-addressed random-access memory.
//
// Fixed-window stack semantics with an overflow table: a value shifted
// past s15 by a window-down op is parked in a LIFO overflow table and
// restored by the next window-up op, so programs of any stack depth run.
// The restored value IS constrained: the overflow-bus multiset argument
// (aux column 0 + columns 35-37, aero_tpu/air/miden.py constraints 40-44)
// proves every restored s15 was previously parked, in LIFO order, and
// that the table is empty again on the final row — *proved* programs must
// therefore end with a balanced overflow table. The u32/mem ops' results
// remain nondeterministic in-AIR pending range-check/memory chiplets;
// the reference's own verifier evaluates NO constraints at all (its
// evaluator is stubbed, stark_verifier.cairo:152-159).
//
// Exposed as a C API (trace generation into a caller-provided buffer) for
// the Python ctypes binding in aero_tpu/vm/__init__.py.

#include <cstdint>
#include <cstring>
#include <map>
#include <sstream>
#include <string>
#include <vector>

namespace {

using u64 = uint64_t;
using u128 = unsigned __int128;

constexpr u64 P = 0xFFFFFFFF00000001ULL;  // Goldilocks

inline u64 fadd(u64 a, u64 b) {
  u128 s = (u128)a + b;
  if (s >= P) s -= P;
  return (u64)s;
}
inline u64 fsub(u64 a, u64 b) { return fadd(a, b ? P - b : 0); }
inline u64 fmul(u64 a, u64 b) {
  u128 x = (u128)a * b;
  u64 lo = (u64)x, hi = (u64)(x >> 64);
  u64 hi_hi = hi >> 32, hi_lo = hi & 0xFFFFFFFFULL;
  u64 t = lo - hi_hi;
  if (lo < hi_hi) t -= 0xFFFFFFFFULL;  // borrow: subtract epsilon
  u64 e = hi_lo * 0xFFFFFFFFULL;       // hi_lo * (2^32 - 1) < 2^64
  u64 r = t + e;
  if (r < t) r += 0xFFFFFFFFULL;       // carry: add epsilon
  if (r >= P) r -= P;
  return r;
}
inline u64 fpow(u64 a, u64 e) {
  u64 r = 1;
  while (e) {
    if (e & 1) r = fmul(r, a);
    a = fmul(a, a);
    e >>= 1;
  }
  return r;
}
inline u64 finv(u64 a) { return fpow(a, P - 2); }

// op = group*8 + member. Order must match aero_tpu/vm/__init__.py OPS.
enum Op : int {
  // group 0: window-down (a value enters at s0)
  PUSH = 0, ADVPUSH, DUP0, DUP1, DUP2, DUP3, DUP4, DUP5,
  // group 1: window-up (top consumed/merged)
  DROP = 8, ADD, SUB, MUL, AND, OR, EQ, NEQ,
  // group 2: in-place
  NOP = 16, HALT, NEG, NOT, INV, EQZ, ASSERT, SWAP,
  // group 3: permutations + high dups
  MOVUP2 = 24, MOVUP3, MOVUP4, MOVDN2, MOVDN3, MOVDN4, DUP6, DUP7,
  // group 4: u32 family, in-place + binary (checked: operands < 2^32)
  U32LO = 32, U32HI, U32ADD, U32SUB, U32MUL, U32DIV, U32MOD, U32AND,
  // group 5: u32 bitwise/shift/compare + random-access memory
  U32OR = 40, U32XOR, U32NOT, U32SHL, U32SHR, U32LT, MEMLOAD, MEMSTORE,
  NUM_OPS
};

constexpr int NUM_COLS = 72;
constexpr int COL_CLK = 0;
constexpr int COL_G = 1;       // 6 group selectors
constexpr int COL_M = 7;       // 8 member selectors
constexpr int COL_IMM = 15;
constexpr int COL_STACK = 16;  // s0..s15
constexpr int COL_DEPTH = 32;
constexpr int COL_OVF = 33;
constexpr int COL_H0 = 34;
// Overflow-bus bookkeeping (value soundness of the LIFO overflow table,
// enforced by the aux-column-0 multiset argument in aero_tpu/air/miden.py):
constexpr int COL_B1 = 35;   // address (insertion clk+1) of the newest
                             // overflow row; 0 = table empty
constexpr int COL_E = 36;    // emptiness flag: 1 iff b1 == 0
constexpr int COL_K = 37;    // inverse witness: k = b1^-1 when b1 != 0

struct Instr {
  Op op;
  u64 imm;
};

struct Program {
  std::vector<Instr> body;  // flattened; control markers encoded in imm
  std::string error;
};

// control-flow markers (carried on NOP instrs, never emitted as rows)
constexpr u64 WHILE_MARK = 1ULL << 62;
constexpr u64 ENDWHILE_MARK = (1ULL << 62) + 1;
constexpr u64 IF_MARK = (1ULL << 62) + 2;
constexpr u64 ELSE_MARK = (1ULL << 62) + 3;
constexpr u64 ENDIF_MARK = (1ULL << 62) + 4;

// --- assembler -------------------------------------------------------------

struct Assembler {
  std::map<std::string, std::vector<std::string>> procs;
  std::string error;

  static std::vector<std::string> tokenize(const std::string& src) {
    std::vector<std::string> out;
    std::stringstream ss(src);
    std::string line;
    while (std::getline(ss, line)) {
      size_t h = line.find('#');
      if (h != std::string::npos) line = line.substr(0, h);
      std::stringstream ls(line);
      std::string tok;
      while (ls >> tok) out.push_back(tok);
    }
    return out;
  }

  // structured block -> flat token list with control markers
  bool parse_block(const std::vector<std::string>& toks, size_t& i,
                   std::vector<std::string>& flat,
                   const std::string& terminator, bool allow_else = false) {
    while (i < toks.size()) {
      const std::string& t = toks[i];
      if (t == terminator) { ++i; return true; }
      if (allow_else && t == "else") return true;  // caller handles
      if (t.rfind("repeat.", 0) == 0) {
        long n = std::stol(t.substr(7));
        ++i;
        std::vector<std::string> inner;
        if (!parse_block(toks, i, inner, "end")) return false;
        for (long k = 0; k < n; ++k)
          flat.insert(flat.end(), inner.begin(), inner.end());
      } else if (t == "while.true") {
        ++i;
        std::vector<std::string> inner;
        if (!parse_block(toks, i, inner, "end")) return false;
        flat.push_back("<while>");
        flat.insert(flat.end(), inner.begin(), inner.end());
        flat.push_back("<endwhile>");
      } else if (t == "if.true") {
        ++i;
        std::vector<std::string> then_part;
        if (!parse_block(toks, i, then_part, "end", /*allow_else=*/true))
          return false;
        std::vector<std::string> else_part;
        if (i < toks.size() && toks[i] == "else") {
          ++i;
          if (!parse_block(toks, i, else_part, "end")) return false;
        }
        flat.push_back("<if>");
        flat.insert(flat.end(), then_part.begin(), then_part.end());
        flat.push_back("<else>");
        flat.insert(flat.end(), else_part.begin(), else_part.end());
        flat.push_back("<endif>");
      } else if (t.rfind("exec.", 0) == 0) {
        std::string name = t.substr(5);
        auto it = procs.find(name);
        if (it == procs.end()) { error = "unknown proc " + name; return false; }
        ++i;
        std::vector<std::string> sub;
        if (!parse_block_list(it->second, sub)) return false;
        flat.insert(flat.end(), sub.begin(), sub.end());
      } else {
        flat.push_back(t);
        ++i;
      }
    }
    if (!terminator.empty()) { error = "missing " + terminator; return false; }
    return true;
  }

  bool parse_block_list(const std::vector<std::string>& toks,
                        std::vector<std::string>& flat) {
    size_t i = 0;
    return parse_block(toks, i, flat, "");
  }

  // single token -> instruction sequence (desugaring imm forms / div)
  bool encode(const std::string& t, std::vector<Instr>& out) {
    auto imm_of = [&](const std::string& s) { return std::stoull(s) % P; };
    if (t == "<while>") { out.push_back({NOP, WHILE_MARK}); return true; }
    if (t == "<endwhile>") { out.push_back({NOP, ENDWHILE_MARK}); return true; }
    if (t == "<if>") { out.push_back({NOP, IF_MARK}); return true; }
    if (t == "<else>") { out.push_back({NOP, ELSE_MARK}); return true; }
    if (t == "<endif>") { out.push_back({NOP, ENDIF_MARK}); return true; }

    if (t.rfind("push.", 0) == 0) { out.push_back({PUSH, imm_of(t.substr(5))}); return true; }
    if (t == "adv.push" || t == "adv_push") { out.push_back({ADVPUSH, 0}); return true; }
    if (t.rfind("dup.", 0) == 0) {
      long k = std::stol(t.substr(4));
      if (k < 0 || k > 7) { error = "dup." + std::to_string(k) + " out of range (0-7)"; return false; }
      static const Op dups[8] = {DUP0, DUP1, DUP2, DUP3, DUP4, DUP5, DUP6, DUP7};
      out.push_back({dups[k], 0});
      return true;
    }
    if (t == "dup") { out.push_back({DUP0, 0}); return true; }
    if (t == "swap" || t == "swap.1") { out.push_back({SWAP, 0}); return true; }
    if (t == "movup.2") { out.push_back({MOVUP2, 0}); return true; }
    if (t == "movup.3") { out.push_back({MOVUP3, 0}); return true; }
    if (t == "movup.4") { out.push_back({MOVUP4, 0}); return true; }
    if (t == "movdn.2") { out.push_back({MOVDN2, 0}); return true; }
    if (t == "movdn.3") { out.push_back({MOVDN3, 0}); return true; }
    if (t == "movdn.4") { out.push_back({MOVDN4, 0}); return true; }
    if (t == "drop") { out.push_back({DROP, 0}); return true; }

    // field arithmetic (+ immediate desugar: op.N => push.N op)
    static const std::map<std::string, Op> simple = {
        {"add", ADD}, {"sub", SUB}, {"mul", MUL}, {"neg", NEG},
        {"eq", EQ}, {"neq", NEQ}, {"not", NOT}, {"and", AND}, {"or", OR},
        {"inv", INV}, {"eqz", EQZ}, {"assert", ASSERT},
        {"noop", NOP}, {"nop", NOP}};
    auto it = simple.find(t);
    if (it != simple.end()) { out.push_back({it->second, 0}); return true; }

    size_t dot = t.find('.');
    if (dot != std::string::npos) {
      std::string base = t.substr(0, dot);
      std::string arg = t.substr(dot + 1);
      bool numeric = !arg.empty() &&
                     arg.find_first_not_of("0123456789") == std::string::npos;
      if (numeric) {
        u64 v = imm_of(arg);
        if (base == "add" || base == "mul" || base == "eq" || base == "neq") {
          out.push_back({PUSH, v});
          out.push_back({simple.at(base), 0});
          return true;
        }
        if (base == "sub") {  // s0 - N: sub computes s1-s0 after push
          out.push_back({PUSH, v});
          out.push_back({SUB, 0});
          return true;
        }
        if (base == "div") {  // s0 / N
          out.push_back({PUSH, v});
          out.push_back({INV, 0});
          out.push_back({MUL, 0});
          return true;
        }
      }
    }
    if (t == "div") {  // a/b for (s0=b, s1=a): inv then mul
      out.push_back({INV, 0});
      out.push_back({MUL, 0});
      return true;
    }

    // u32 family. Binary ops take (s1=a, s0=b) -> result, window-up.
    static const std::map<std::string, Op> u32ops = {
        {"u32lo", U32LO}, {"u32hi", U32HI}, {"u32add", U32ADD},
        {"u32sub", U32SUB}, {"u32mul", U32MUL}, {"u32div", U32DIV},
        {"u32mod", U32MOD}, {"u32and", U32AND}, {"u32or", U32OR},
        {"u32xor", U32XOR}, {"u32not", U32NOT}, {"u32shl", U32SHL},
        {"u32shr", U32SHR}, {"u32lt", U32LT}};
    auto u32it = u32ops.find(t);
    if (u32it != u32ops.end()) { out.push_back({u32it->second, 0}); return true; }
    if (t == "u32split") {
      // s0 = a -> (s0 = a mod 2^32, s1 = a >> 32); net depth +1
      out.push_back({DUP0, 0});
      out.push_back({U32HI, 0});
      out.push_back({SWAP, 0});
      out.push_back({U32LO, 0});
      return true;
    }
    // u32 immediate forms: u32add.N => push.N u32add, etc.
    if (dot != std::string::npos) {
      std::string base = t.substr(0, dot);
      std::string arg = t.substr(dot + 1);
      bool numeric = !arg.empty() &&
                     arg.find_first_not_of("0123456789") == std::string::npos;
      if (numeric) {
        u64 v = imm_of(arg);
        auto bit = u32ops.find(base);
        if (bit != u32ops.end() && bit->second >= U32ADD) {
          out.push_back({PUSH, v});
          out.push_back({bit->second, 0});
          return true;
        }
      }
    }
    // memory: mem.load[.ADDR] / mem.store[.ADDR]
    if (t == "mem.load") { out.push_back({MEMLOAD, 0}); return true; }
    if (t == "mem.store") { out.push_back({MEMSTORE, 0}); return true; }
    if (t.rfind("mem.load.", 0) == 0) {
      out.push_back({PUSH, imm_of(t.substr(9))});
      out.push_back({MEMLOAD, 0});
      return true;
    }
    if (t.rfind("mem.store.", 0) == 0) {
      out.push_back({PUSH, imm_of(t.substr(10))});
      out.push_back({MEMSTORE, 0});
      return true;
    }
    error = "unknown instruction: " + t;
    return false;
  }

  Program assemble(const std::string& src) {
    Program prog;
    auto toks = tokenize(src);
    std::vector<std::string> main_toks;
    for (size_t i = 0; i < toks.size();) {
      if (toks[i].rfind("proc.", 0) == 0) {
        std::string name = toks[i].substr(5);
        ++i;
        std::vector<std::string> body;
        int depth = 0;
        while (i < toks.size()) {
          if (toks[i] == "end" && depth == 0) { ++i; break; }
          if (toks[i].rfind("repeat.", 0) == 0 || toks[i] == "while.true" ||
              toks[i] == "if.true")
            ++depth;
          if (toks[i] == "end") --depth;
          body.push_back(toks[i]);
          ++i;
        }
        procs[name] = body;
      } else if (toks[i] == "begin") {
        ++i;
        int depth = 0;
        while (i < toks.size()) {
          if (toks[i] == "end" && depth == 0) { ++i; break; }
          if (toks[i].rfind("repeat.", 0) == 0 || toks[i] == "while.true" ||
              toks[i] == "if.true")
            ++depth;
          if (toks[i] == "end") --depth;
          main_toks.push_back(toks[i]);
          ++i;
        }
      } else {
        ++i;
      }
    }
    std::vector<std::string> flat;
    if (!parse_block_list(main_toks, flat)) {
      prog.error = error;
      return prog;
    }
    for (auto& t : flat) {
      if (!encode(t, prog.body)) { prog.error = error; return prog; }
    }
    return prog;
  }
};

// --- executor --------------------------------------------------------------

struct OvfRow {
  u64 addr;  // insertion clk + 1 (unique, strictly increasing, never 0)
  u64 val;   // the parked value
};

struct Executor {
  std::vector<u64> stack;      // s0 = front (fixed 16-slot window)
  std::vector<OvfRow> overflow;  // LIFO table of values shifted past s15
  std::map<u64, u64> memory; // random-access word memory (default 0)
  std::vector<std::vector<u64>> rows;
  std::vector<u64> advice;
  size_t advice_pos = 0;
  u64 clk = 0;
  u64 ovf_ctr = 0;  // field-element net (#down - #up) counter, column 33
  std::string error;

  Executor(const std::vector<u64>& inputs, const std::vector<u64>& adv)
      : advice(adv) {
    stack.assign(16, 0);
    // inputs: first element = top of stack (matches the golden vector's
    // stack_inputs ordering: [1, 0] with 1 on top)
    for (size_t i = 0; i < inputs.size() && i < 16; ++i) stack[i] = inputs[i];
  }

  void emit_row(Op op, u64 imm, u64 h0) {
    std::vector<u64> row(NUM_COLS, 0);
    row[COL_CLK] = clk;
    row[COL_G + op / 8] = 1;
    row[COL_M + op % 8] = 1;
    row[COL_IMM] = imm;
    for (int j = 0; j < 16; ++j) row[COL_STACK + j] = stack[j];
    row[COL_DEPTH] = 16;
    row[COL_OVF] = ovf_ctr;
    row[COL_H0] = h0;
    u64 b1 = overflow.empty() ? 0 : overflow.back().addr;
    row[COL_B1] = b1;
    row[COL_E] = b1 ? 0 : 1;
    row[COL_K] = b1 ? finv(b1) : 0;
    rows.push_back(std::move(row));
    ++clk;
  }

  // Window-down: the value leaving s15 is parked in the overflow table
  // (with its insertion address clk+1, used as the unique row id of the
  // aux-column-0 multiset bus) and restored LIFO by the next window-up
  // op. The bus argument makes the restored value *sound*: the deleted
  // tuple (b1, s15', b1') must match a previously inserted row, and the
  // prev-pointer chain forces LIFO order (aero_tpu/air/miden.py:40-44).
  bool push_shift(u64 v) {
    overflow.push_back({clk, stack[15]});  // clk was ++'d by emit_row:
                                           // addr = row_clk + 1
    for (int j = 15; j > 0; --j) stack[j] = stack[j - 1];
    stack[0] = v;
    ovf_ctr = fadd(ovf_ctr, 1);
    return true;
  }
  void pop_shift() {
    for (int j = 0; j < 15; ++j) stack[j] = stack[j + 1];
    if (!overflow.empty()) {
      stack[15] = overflow.back().val;
      overflow.pop_back();
    } else {
      stack[15] = 0;
    }
    ovf_ctr = fsub(ovf_ctr, 1);
  }

  bool dup_k(int k) { return push_shift(stack[k]); }

  bool step(const Instr& ins) {
    u64 h0 = 0;
    switch (ins.op) {  // helper witnesses (recorded on the row)
      case EQ: case NEQ: {
        u64 d = fsub(stack[0], stack[1]);
        h0 = d ? finv(d) : 0;
        break;
      }
      case EQZ: h0 = stack[0] ? finv(stack[0]) : 0; break;
      case INV:
        if (stack[0] == 0) { error = "inv of zero"; return false; }
        h0 = finv(stack[0]);
        break;
      // u32 wrap-around witnesses (constrained exactly in the AIR):
      case U32ADD: h0 = (stack[1] + stack[0]) >> 32; break;       // carry
      case U32SUB: h0 = stack[1] < stack[0] ? 1 : 0; break;       // borrow
      default: break;
    }
    emit_row(ins.op, ins.imm, h0);
    switch (ins.op) {
      case NOP: case HALT: break;
      case PUSH: if (!push_shift(ins.imm)) return false; break;
      case ADVPUSH:
        if (advice_pos >= advice.size()) { error = "advice tape exhausted"; return false; }
        if (!push_shift(advice[advice_pos++])) return false;
        break;
      case DROP: pop_shift(); break;
      case DUP0: case DUP1: case DUP2: case DUP3:
      case DUP4: case DUP5:
        if (!dup_k(ins.op - DUP0)) return false;
        break;
      case DUP6: if (!dup_k(6)) return false; break;
      case DUP7: if (!dup_k(7)) return false; break;
      case SWAP: std::swap(stack[0], stack[1]); break;
      case MOVUP2: { u64 v = stack[2]; stack[2] = stack[1]; stack[1] = stack[0]; stack[0] = v; break; }
      case MOVUP3: { u64 v = stack[3]; stack[3] = stack[2]; stack[2] = stack[1]; stack[1] = stack[0]; stack[0] = v; break; }
      case MOVUP4: { u64 v = stack[4]; stack[4] = stack[3]; stack[3] = stack[2]; stack[2] = stack[1]; stack[1] = stack[0]; stack[0] = v; break; }
      case MOVDN2: { u64 v = stack[0]; stack[0] = stack[1]; stack[1] = stack[2]; stack[2] = v; break; }
      case MOVDN3: { u64 v = stack[0]; stack[0] = stack[1]; stack[1] = stack[2]; stack[2] = stack[3]; stack[3] = v; break; }
      case MOVDN4: { u64 v = stack[0]; stack[0] = stack[1]; stack[1] = stack[2]; stack[2] = stack[3]; stack[3] = stack[4]; stack[4] = v; break; }
      case ADD: { u64 v = fadd(stack[0], stack[1]); pop_shift(); stack[0] = v; break; }
      case SUB: { u64 v = fsub(stack[1], stack[0]); pop_shift(); stack[0] = v; break; }
      case MUL: { u64 v = fmul(stack[0], stack[1]); pop_shift(); stack[0] = v; break; }
      case NEG: stack[0] = stack[0] ? P - stack[0] : 0; break;
      case INV: stack[0] = h0; break;
      case EQ: { u64 v = stack[0] == stack[1] ? 1 : 0; pop_shift(); stack[0] = v; break; }
      case NEQ: { u64 v = stack[0] != stack[1] ? 1 : 0; pop_shift(); stack[0] = v; break; }
      case EQZ: stack[0] = stack[0] == 0 ? 1 : 0; break;
      case NOT:
        if (stack[0] > 1) { error = "not on non-boolean"; return false; }
        stack[0] = 1 - stack[0];
        break;
      case AND:
        if (stack[0] > 1 || stack[1] > 1) { error = "and on non-boolean"; return false; }
        { u64 v = fmul(stack[0], stack[1]); pop_shift(); stack[0] = v; }
        break;
      case OR:
        if (stack[0] > 1 || stack[1] > 1) { error = "or on non-boolean"; return false; }
        { u64 v = fsub(fadd(stack[0], stack[1]), fmul(stack[0], stack[1])); pop_shift(); stack[0] = v; }
        break;
      case ASSERT:
        if (stack[0] != 1) { error = "assertion failed (top != 1)"; return false; }
        pop_shift();
        break;

      // u32 family: checked-wrapping semantics (operands must already be
      // u32 values; results reduced mod 2^32). Binary ops take s1=a, s0=b.
      case U32LO: stack[0] = stack[0] & 0xFFFFFFFFULL; break;
      case U32HI: stack[0] = stack[0] >> 32; break;
      case U32NOT:
        if (stack[0] >> 32) { error = "u32not on non-u32 operand"; return false; }
        stack[0] = ~stack[0] & 0xFFFFFFFFULL;
        break;
      case U32ADD: case U32SUB: case U32MUL: case U32DIV: case U32MOD:
      case U32AND: case U32OR: case U32XOR: case U32SHL: case U32SHR:
      case U32LT: {
        u64 b = stack[0], a = stack[1];
        if (a >> 32 || b >> 32) { error = "u32 op on non-u32 operand"; return false; }
        u64 v = 0;
        switch (ins.op) {
          case U32ADD: v = (a + b) & 0xFFFFFFFFULL; break;
          case U32SUB: v = (a - b) & 0xFFFFFFFFULL; break;
          case U32MUL: v = (a * b) & 0xFFFFFFFFULL; break;
          case U32DIV:
            if (!b) { error = "u32div by zero"; return false; }
            v = a / b;
            break;
          case U32MOD:
            if (!b) { error = "u32mod by zero"; return false; }
            v = a % b;
            break;
          case U32AND: v = a & b; break;
          case U32OR: v = a | b; break;
          case U32XOR: v = a ^ b; break;
          case U32SHL:
            if (b >= 32) { error = "u32shl shift >= 32"; return false; }
            v = (a << b) & 0xFFFFFFFFULL;
            break;
          case U32SHR:
            if (b >= 32) { error = "u32shr shift >= 32"; return false; }
            v = a >> b;
            break;
          case U32LT: v = a < b ? 1 : 0; break;
          default: break;
        }
        pop_shift();
        stack[0] = v;
        break;
      }
      case MEMLOAD: {  // in-place: s0 = mem[s0]
        auto it = memory.find(stack[0]);
        stack[0] = it == memory.end() ? 0 : it->second;
        break;
      }
      case MEMSTORE: {  // pop addr; mem[addr] = new top (value stays)
        u64 addr = stack[0];
        pop_shift();
        memory[addr] = stack[0];
        break;
      }
      default: error = "bad op"; return false;
    }
    return true;
  }

  // consume a control-flow condition: emitted as a DROP row so the
  // transition constraints hold
  u64 consume_condition() {
    u64 cond = stack[0];
    emit_row(DROP, 0, 0);
    pop_shift();
    return cond;
  }

  bool run(const std::vector<Instr>& body, u64 max_steps) {
    size_t pc = 0;
    std::vector<size_t> loop_starts;
    auto skip_to = [&](size_t& p, u64 open, u64 close, u64 also_stop) -> bool {
      // advance p past matching close (or stop AT also_stop at depth 0)
      int depth = 0;
      ++p;
      while (p < body.size()) {
        u64 im = body[p].op == NOP ? body[p].imm : 0;
        if (im == open) ++depth;
        else if (im == close) {
          if (depth == 0) return true;
          --depth;
        } else if (also_stop && im == also_stop && depth == 0) {
          return true;
        }
        ++p;
      }
      return false;
    };
    while (pc < body.size()) {
      if (clk > max_steps) { error = "max steps exceeded"; return false; }
      const Instr& ins = body[pc];
      u64 mark = (ins.op == NOP && ins.imm >= WHILE_MARK) ? ins.imm : 0;
      if (mark == WHILE_MARK) {
        u64 cond = consume_condition();
        if (cond == 1) {
          loop_starts.push_back(pc);
          ++pc;
        } else if (cond == 0) {
          if (!skip_to(pc, WHILE_MARK, ENDWHILE_MARK, 0)) { error = "missing endwhile"; return false; }
          ++pc;
        } else {
          error = "while condition not boolean";
          return false;
        }
        continue;
      }
      if (mark == ENDWHILE_MARK) {
        pc = loop_starts.back();
        loop_starts.pop_back();
        continue;
      }
      if (mark == IF_MARK) {
        u64 cond = consume_condition();
        if (cond == 1) {
          ++pc;  // run then-branch (up to ELSE_MARK)
        } else if (cond == 0) {
          if (!skip_to(pc, IF_MARK, ELSE_MARK, 0)) { error = "missing else marker"; return false; }
          ++pc;  // run else-branch
        } else {
          error = "if condition not boolean";
          return false;
        }
        continue;
      }
      if (mark == ELSE_MARK) {
        // finished then-branch: skip the else-branch
        if (!skip_to(pc, IF_MARK, ENDIF_MARK, 0)) { error = "missing endif"; return false; }
        ++pc;
        continue;
      }
      if (mark == ENDIF_MARK) { ++pc; continue; }
      if (!step(ins)) return false;
      ++pc;
    }
    return true;
  }
};

std::string g_error;

}  // namespace

extern "C" {

// Executes `src` with `inputs` (top-first) and the nondeterministic
// `advice` tape. Writes the trace column-major (col * n_rows + row) into
// `trace_out` (caller-allocated, 72 * max_rows), the final 16-slot stack
// into `stack_out`. Rows are padded to the next power of two (>= 8) with
// HALT rows repeating the final state.
// Returns the padded row count, or -1 on error (message via vm_last_error).
long long vm_execute(const char* src, const u64* inputs, long long n_inputs,
                     const u64* advice, long long n_advice,
                     u64* trace_out, long long max_rows, u64* stack_out) {
  Assembler as;
  Program prog = as.assemble(src);
  if (!prog.error.empty()) { g_error = prog.error; return -1; }

  Executor ex(std::vector<u64>(inputs, inputs + n_inputs),
              std::vector<u64>(advice, advice + n_advice));
  if (!ex.run(prog.body, (u64)max_rows - 1)) { g_error = ex.error; return -1; }

  // final HALT row
  ex.emit_row(HALT, 0, 0);

  long long n = (long long)ex.rows.size();
  long long padded = 8;
  while (padded < n) padded <<= 1;
  if (padded > max_rows) { g_error = "trace exceeds max_rows"; return -1; }

  // pad with HALT rows (clk keeps incrementing, state frozen)
  while ((long long)ex.rows.size() < padded) ex.emit_row(HALT, 0, 0);

  for (long long r = 0; r < padded; ++r)
    for (int c = 0; c < NUM_COLS; ++c)
      trace_out[(long long)c * padded + r] = ex.rows[r][c];
  for (int j = 0; j < 16; ++j) stack_out[j] = ex.stack[j];
  return padded;
}

const char* vm_last_error() { return g_error.c_str(); }

}  // extern "C"
