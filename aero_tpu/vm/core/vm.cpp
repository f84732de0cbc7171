// Miden-assembly-subset virtual machine: assembler + executor (native core).
//
// The reference's VM is the forked miden-vm processor (submodule not
// vendored; reference call sites: miden_processor::execute at
// aero-sdk/miden-wasm/src/proving_worker.rs:226, program assembly at
// miden-proof-generator/src/main.rs:55-74). This is a from-scratch
// re-design covering the instruction subset those programs use
// (push/dup/swap/movup/movdn/drop/add/sub/mul/neg/eq/neq/not/and/or,
// repeat.N unrolling, while.true, proc/exec), producing an execution trace
// in the aero-tpu Miden-compatible layout:
//
//   column 0      : clk
//   columns 1-20  : one-hot op selectors (NOP..HALT)
//   column 21     : immediate value (push)
//   columns 22-37 : stack s0..s15 (s0 = top)
//   column 38     : virtual stack depth
//   column 39     : overflow bookkeeping counter (round-1: always 0)
//   columns 40-41 : helper columns (h0 = inverse witness for eq/neq)
//   columns 42-71 : reserved chiplet columns (zero; unconstrained in
//                   round 1 - see aero_tpu/air/miden.py)
//
// Fixed-window stack semantics: push shifts the window down; a non-zero
// value shifted out of s15 is an "overflow unsupported" runtime error
// (the fib/demo programs keep depth <= 16, matching the golden vector's
// empty overflow_addrs).
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

enum Op : int {
  NOP = 0, PUSH, DROP, DUP0, DUP1, SWAP, MOVUP2, MOVUP3, MOVDN2, MOVDN3,
  ADD, SUB, MUL, NEG, EQ, NEQ, NOT, AND, OR, HALT,
  NUM_OPS
};

constexpr int NUM_COLS = 72;
constexpr int COL_CLK = 0;
constexpr int COL_SEL = 1;     // 20 selectors
constexpr int COL_IMM = 21;
constexpr int COL_STACK = 22;  // s0..s15
constexpr int COL_DEPTH = 38;
constexpr int COL_OVF = 39;
constexpr int COL_H0 = 40;

struct Instr {
  Op op;
  u64 imm;
  // control-flow markers used only during assembly
};

struct Program {
  std::vector<Instr> body;           // flattened, no control flow except WHILE
  std::string error;
};

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

  bool parse_block(const std::vector<std::string>& toks, size_t& i,
                   std::vector<std::string>& flat,
                   const std::string& terminator) {
    while (i < toks.size()) {
      const std::string& t = toks[i];
      if (t == terminator) { ++i; return true; }
      if (t == "repeat" || t.rfind("repeat.", 0) == 0) {
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
      } else if (t.rfind("exec.", 0) == 0) {
        std::string name = t.substr(5);
        auto it = procs.find(name);
        if (it == procs.end()) { error = "unknown proc " + name; return false; }
        ++i;
        size_t j = 0;
        std::vector<std::string> sub;
        // proc bodies are already flat token lists; splice recursively
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

  Program assemble(const std::string& src) {
    Program prog;
    auto toks = tokenize(src);
    // collect procs
    std::vector<std::string> main_toks;
    for (size_t i = 0; i < toks.size();) {
      if (toks[i].rfind("proc.", 0) == 0) {
        std::string name = toks[i].substr(5);
        ++i;
        std::vector<std::string> body;
        int depth = 0;
        while (i < toks.size()) {
          if (toks[i] == "end" && depth == 0) { ++i; break; }
          if (toks[i].rfind("repeat", 0) == 0 || toks[i] == "while.true" ||
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
          if (toks[i].rfind("repeat", 0) == 0 || toks[i] == "while.true" ||
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
    // encode (control markers encoded with special ops handled by executor)
    for (auto& t : flat) {
      Instr ins{NOP, 0};
      if (t == "<while>") { prog.body.push_back({NOP, 1ULL << 62}); continue; }
      if (t == "<endwhile>") { prog.body.push_back({NOP, 1ULL << 63}); continue; }
      if (t.rfind("push.", 0) == 0) { ins.op = PUSH; ins.imm = std::stoull(t.substr(5)) % P; }
      else if (t == "drop") ins.op = DROP;
      else if (t == "dup" || t == "dup.0") ins.op = DUP0;
      else if (t == "dup.1") ins.op = DUP1;
      else if (t == "swap" || t == "swap.1") ins.op = SWAP;
      else if (t == "movup.2") ins.op = MOVUP2;
      else if (t == "movup.3") ins.op = MOVUP3;
      else if (t == "movdn.2") ins.op = MOVDN2;
      else if (t == "movdn.3") ins.op = MOVDN3;
      else if (t == "add") ins.op = ADD;
      else if (t == "sub") ins.op = SUB;
      else if (t == "mul") ins.op = MUL;
      else if (t == "neg") ins.op = NEG;
      else if (t == "eq") ins.op = EQ;
      else if (t == "neq") ins.op = NEQ;
      else if (t == "not") ins.op = NOT;
      else if (t == "and") ins.op = AND;
      else if (t == "or") ins.op = OR;
      else if (t == "noop") ins.op = NOP;
      else { prog.error = "unknown instruction: " + t; return prog; }
      prog.body.push_back(ins);
    }
    return prog;
  }
};

// --- executor --------------------------------------------------------------

constexpr u64 WHILE_MARK = 1ULL << 62;
constexpr u64 ENDWHILE_MARK = 1ULL << 63;

struct Executor {
  std::vector<u64> stack;  // s0 = front
  std::vector<std::vector<u64>> rows;
  u64 clk = 0;
  std::string error;

  Executor(const std::vector<u64>& inputs) {
    stack.assign(16, 0);
    // inputs: first element = top of stack (matches the golden vector's
    // stack_inputs ordering: [1, 0] with 1 on top)
    for (size_t i = 0; i < inputs.size() && i < 16; ++i) stack[i] = inputs[i];
  }

  void emit_row(Op op, u64 imm, u64 h0) {
    std::vector<u64> row(NUM_COLS, 0);
    row[COL_CLK] = clk;
    row[COL_SEL + op] = 1;
    row[COL_IMM] = imm;
    for (int j = 0; j < 16; ++j) row[COL_STACK + j] = stack[j];
    row[COL_DEPTH] = 16;
    row[COL_OVF] = 0;
    row[COL_H0] = h0;
    rows.push_back(std::move(row));
    ++clk;
  }

  bool push_shift(u64 v) {
    if (stack[15] != 0) { error = "stack overflow unsupported (round 1)"; return false; }
    for (int j = 15; j > 0; --j) stack[j] = stack[j - 1];
    stack[0] = v;
    return true;
  }
  void pop_shift() {
    for (int j = 0; j < 15; ++j) stack[j] = stack[j + 1];
    stack[15] = 0;
  }

  bool step(const Instr& ins) {
    u64 h0 = 0;
    // helper witness for eq/neq: inverse of (s0 - s1) when nonzero
    if (ins.op == EQ || ins.op == NEQ) {
      u64 d = fsub(stack[0], stack[1]);
      h0 = d ? finv(d) : 0;
    }
    emit_row(ins.op, ins.imm, h0);
    switch (ins.op) {
      case NOP: break;
      case PUSH: if (!push_shift(ins.imm)) return false; break;
      case DROP: pop_shift(); break;
      case DUP0: if (!push_shift(stack[0])) return false; break;
      case DUP1: if (!push_shift(stack[1])) return false; break;
      case SWAP: std::swap(stack[0], stack[1]); break;
      case MOVUP2: { u64 v = stack[2]; stack[2] = stack[1]; stack[1] = stack[0]; stack[0] = v; break; }
      case MOVUP3: { u64 v = stack[3]; stack[3] = stack[2]; stack[2] = stack[1]; stack[1] = stack[0]; stack[0] = v; break; }
      case MOVDN2: { u64 v = stack[0]; stack[0] = stack[1]; stack[1] = stack[2]; stack[2] = v; break; }
      case MOVDN3: { u64 v = stack[0]; stack[0] = stack[1]; stack[1] = stack[2]; stack[2] = stack[3]; stack[3] = v; break; }
      case ADD: { u64 v = fadd(stack[0], stack[1]); pop_shift(); stack[0] = v; break; }
      case SUB: { u64 v = fsub(stack[1], stack[0]); pop_shift(); stack[0] = v; break; }
      case MUL: { u64 v = fmul(stack[0], stack[1]); pop_shift(); stack[0] = v; break; }
      case NEG: stack[0] = stack[0] ? P - stack[0] : 0; break;
      case EQ: { u64 v = stack[0] == stack[1] ? 1 : 0; pop_shift(); stack[0] = v; break; }
      case NEQ: { u64 v = stack[0] != stack[1] ? 1 : 0; pop_shift(); stack[0] = v; break; }
      case NOT: stack[0] = fsub(1, stack[0]); break;
      case AND: { u64 v = fmul(stack[0], stack[1]); pop_shift(); stack[0] = v; break; }
      case OR: { u64 v = fsub(fadd(stack[0], stack[1]), fmul(stack[0], stack[1])); pop_shift(); stack[0] = v; break; }
      case HALT: break;
      default: error = "bad op"; return false;
    }
    return true;
  }

  bool run(const std::vector<Instr>& body, u64 max_steps) {
    size_t pc = 0;
    std::vector<size_t> loop_starts;
    while (pc < body.size()) {
      if (clk > max_steps) { error = "max steps exceeded"; return false; }
      const Instr& ins = body[pc];
      if (ins.op == NOP && ins.imm == WHILE_MARK) {
        // while.true: consumes the condition from the stack top; emitted as
        // a DROP row so the transition constraints hold
        u64 cond = stack[0];
        emit_row(DROP, 0, 0);
        pop_shift();
        if (cond == 1) {
          loop_starts.push_back(pc);
          ++pc;
        } else if (cond == 0) {
          // skip to matching endwhile
          int depth = 0;
          ++pc;
          while (pc < body.size()) {
            if (body[pc].op == NOP && body[pc].imm == WHILE_MARK) ++depth;
            if (body[pc].op == NOP && body[pc].imm == ENDWHILE_MARK) {
              if (depth == 0) break;
              --depth;
            }
            ++pc;
          }
          ++pc;
        } else {
          error = "while condition not boolean";
          return false;
        }
        continue;
      }
      if (ins.op == NOP && ins.imm == ENDWHILE_MARK) {
        pc = loop_starts.back();  // re-test condition
        loop_starts.pop_back();
        continue;
      }
      if (!step(ins)) return false;
      ++pc;
    }
    return true;
  }
};

std::string g_error;

}  // namespace

extern "C" {

// Executes `src` with `inputs` (top-first). Writes the trace column-major
// (col * n_rows + row) into `trace_out` (caller-allocated, 72 * max_rows),
// the final 16-slot stack into `stack_out`. Rows are padded to the next
// power of two (>= 8) with HALT rows repeating the final state.
// Returns the padded row count, or -1 on error (message via vm_last_error).
long long vm_execute(const char* src, const u64* inputs, long long n_inputs,
                     u64* trace_out, long long max_rows, u64* stack_out) {
  Assembler as;
  Program prog = as.assemble(src);
  if (!prog.error.empty()) { g_error = prog.error; return -1; }

  Executor ex(std::vector<u64>(inputs, inputs + n_inputs));
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
